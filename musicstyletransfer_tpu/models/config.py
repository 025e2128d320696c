"""Config base + model configs with YAML round-trip persistence.

Reference: VarAutoEncoder/config.py:81-222 (Config with freeze + YAML tags +
backward-compatible default fill-in) and the model config classes at
model.py:11-54 / transformer.py:8-21.

Design: plain dataclasses registered with tagged YAML representers
(``!ModelConfig`` etc., same sidecar format family as the reference).
Loading fills missing fields from dataclass defaults so old config files
keep working (reference: config.py:105-115).
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Any, Dict, Optional, Type, TypeVar

import yaml

_T = TypeVar("_T", bound="Config")
_REGISTRY: Dict[str, Type["Config"]] = {}


class _ConfigLoader(yaml.SafeLoader):
    pass


class _ConfigDumper(yaml.SafeDumper):
    pass


def register_config(cls: Type[_T]) -> Type[_T]:
    """Class decorator: register ``!ClassName`` YAML tag for a Config dataclass."""
    tag = "!" + cls.__name__
    _REGISTRY[tag] = cls

    def _represent(dumper: yaml.Dumper, obj: Any) -> yaml.Node:
        state = {f.name: getattr(obj, f.name) for f in dataclasses.fields(obj)}
        return dumper.represent_mapping(tag, state)

    def _construct(loader: yaml.Loader, node: yaml.Node) -> Any:
        state = loader.construct_mapping(node, deep=True)
        known = {f.name for f in dataclasses.fields(cls)}
        # Backward-compatible default fill-in: ignore unknown keys, let
        # dataclass defaults cover missing ones (reference: config.py:105-115).
        return cls(**{k: v for k, v in state.items() if k in known})

    _ConfigDumper.add_representer(cls, _represent)
    _ConfigLoader.add_constructor(tag, _construct)
    return cls


@dataclasses.dataclass(frozen=True)
class Config:
    """Base for YAML-persistable configs (reference: config.py:90-222)."""

    def copy(self: _T, **overrides: Any) -> _T:
        new = copy.deepcopy(self)
        for k, v in overrides.items():
            object.__setattr__(new, k, v)
        return new

    def save(self, fname: str) -> None:
        with open(fname, "w") as out:
            yaml.dump(self, out, Dumper=_ConfigDumper, default_flow_style=False)

    @staticmethod
    def load(fname: str) -> "Config":
        with open(fname) as inp:
            return yaml.load(inp, Loader=_ConfigLoader)

    def to_yaml(self) -> str:
        return yaml.dump(self, Dumper=_ConfigDumper, default_flow_style=False)


@register_config
@dataclasses.dataclass(frozen=True)
class TransformerConfig(Config):
    """Reference: transformer.py:8-21."""

    model_size: int = 128
    dropout: float = 0.0
    num_layers: int = 1
    num_heads: int = 8
    vocab_size: Optional[int] = None
    # TPU-native additions (defaults preserve reference behavior):
    ffn_multiplier: int = 4
    max_positions: int = 10000  # positional table size (transformer.py:217)
    use_flash_attention: bool = False  # Pallas fused attention on TPU
    # Flash engages only at sequence lengths where it beats XLA's fused
    # attention (measured fwd+bwd on v5e, causal bf16 D=64: 0.90x at T=512,
    # 1.12x at 1024, 1.51x at 2048, 2.12x at 4096); below this the dense
    # path runs even with use_flash_attention=True. Set 0 to force flash.
    flash_min_seq_len: int = 1024
    # Fused short-T attention core (ops/attention_core.py): consumes the
    # QKV projection's output in its natural interleaved layout and keeps
    # the [T, T] scores VMEM-resident — no HBM score tensor, no layout
    # transposes, near-free custom-VJP boundary. Engages for
    # attention_core_min_seq_len <= T < flash_min_seq_len when
    # use_flash_attention is on and no mesh is live (GSPMD cannot
    # partition the kernel over batch). 0 disables (the XLA materializing
    # path runs instead). Default measured on v5e (scripts/core-ab.py,
    # 3 interleaved pairs, round 4): full train step 1.22x at the scaled
    # config (13.34 -> 10.94 ms) and 1.14x at the wide config (17.96 ->
    # 15.81 ms) — the regime where the streaming flash kernel LOST 1.4x
    # in-model (BASELINE.md "Attention at T<=512").
    attention_core_min_seq_len: int = 256
    # Route the core's custom-VJP backward through plain XLA einsums
    # (same recompute-from-lse math) instead of the Pallas backward
    # kernel. Overflow-robust at extreme cotangent magnitudes: the wide
    # config's transient training spikes reach ~1e19 (forward healthy),
    # where the Pallas backward emits non-finite dqkv and the XLA
    # formulation stays finite (BASELINE.md round-5 wide NaN
    # post-mortem). Costs part of the core's backward fusion win; the
    # wide training script enables it.
    attention_core_xla_backward: bool = False
    # Residual-norm placement. "post" (default) is the reference's
    # post-LN block: x = LN(x + sublayer(x)) (transformer.py:129-159).
    # "pre" is the modern pre-LN block (x = x + sublayer(LN(x)) with one
    # final stack LN): the backward flows through an identity residual
    # path instead of a product of LN Jacobians, which is what stops the
    # wide config's runaway backward explosion — forward healthy while
    # gradient norms grew 1e4 -> 2e8 -> overflow over ~150 steps under
    # post-LN, three attempts in a row (BASELINE.md round-5 wide NaN
    # post-mortem). The wide training preset uses "pre".
    norm_scheme: str = "post"
    # Sequence parallelism: constrain activations to shard the time axis
    # over the mesh's "model" axis between blocks (GSPMD inserts the
    # all-gathers around attention). No-op off-mesh.
    sequence_sharding: bool = False
    # Ring attention (ops/ring_attention.py): compute attention itself
    # sequence-parallel — K/V chunks rotate over the mesh's "model" axis via
    # ppermute, no device holds full K/V. Engages when a mesh with a >1
    # "model" axis is active and T divides it; otherwise falls through to
    # flash/dense. Intended for long-sequence configs together with
    # sequence_sharding (the model axis then carries time, not heads — do
    # not combine with tensor parallelism on the same axis).
    ring_attention: bool = False
    # Rematerialize each transformer layer in backward (jax.checkpoint):
    # trades recompute FLOPs for activation memory — the right trade for
    # long-sequence training on TPU where HBM is the constraint.
    remat: bool = False


@register_config
@dataclasses.dataclass(frozen=True)
class LSTMConfig(Config):
    """Legacy LSTM decoder config (reference: model.py:11-19)."""

    n_layers: int = 1
    hidden_dim: int = 128
    dropout: float = 0.0


@register_config
@dataclasses.dataclass(frozen=True)
class EncoderConfig(Config):
    """Reference: model.py:35-45."""

    transformer_config: TransformerConfig = dataclasses.field(
        default_factory=TransformerConfig
    )
    latent_dim: int = 64
    num_classes: int = 2
    input_dim: int = 293


@register_config
@dataclasses.dataclass(frozen=True)
class DecoderConfig(Config):
    """Reference: model.py:22-32; ``decoder_type`` selects the legacy LSTM
    variant (model.py:131-203) instead of the transformer decoder."""

    transformer_config: TransformerConfig = dataclasses.field(
        default_factory=TransformerConfig
    )
    latent_dim: int = 64
    num_classes: int = 2
    output_dim: int = 293
    decoder_type: str = "transformer"  # "transformer" | "lstm"
    lstm_config: Optional[LSTMConfig] = None
    # How the target class conditions the decoder:
    #   "initial"  — class embedding enters ONLY through the prepended
    #                conditioning state (reference: model.py:229-232);
    #   "per_step" — class embedding is ALSO added to every position's
    #                token embedding, so the class signal does not have to
    #                survive the whole sequence through attention to the
    #                conditioning position. Measured motivation: at L=2046
    #                initial-state conditioning loses the register axis to
    #                the latent's source information at every free-bits
    #                operating point, while the GAN family's per-step class
    #                input measured 1.6x better pitch fit than
    #                initial-state-only (BASELINE.md round-3/4). Same
    #                parameter tree (reuses class_emb) — checkpoints are
    #                structurally identical; the sidecar config selects the
    #                behavior. Transformer decoder only.
    class_conditioning: str = "initial"  # "initial" | "per_step"


@register_config
@dataclasses.dataclass(frozen=True)
class ModelConfig(Config):
    """Reference: model.py:48-54."""

    encoder_config: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    decoder_config: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    # Compute dtype for activations on TPU; params stay float32.
    dtype: str = "bfloat16"
