"""Pallas TPU fused autoregressive decode: the ENTIRE sampling loop in one
kernel.

The XLA ``lax.while_loop`` decode path (inference/decode.py) re-dispatches
~20 small ops per generated token; at the flagship decoder's size (1 layer,
d=128, B=32) each step is overhead-dominated (~26us/step measured on v5e).
This kernel keeps the decoder weights, the KV cache, and every activation
resident in VMEM and runs the full generate loop — embed -> attention ->
FFN -> vocab head -> Gumbel-max sampling -> EOS bookkeeping — as ONE
Mosaic program, eliminating per-step HBM round trips and dispatch.

Semantics mirror ``inference/decode.py::decode_sampled`` and the flax
decode path (models/vae.py::VAEDecoder.step_token + transformer.py step):

- position 0 processes the conditioning state ``latent2hid(z)+class_emb``
  (reference: model.py:229-232); its head output is unused;
- per step t: x = sqrt(d)*emb[token] + pos[t]; per layer post-LN attention
  over cache[0..t] and 4x ReLU FFN; f32 vocab head; multinomial sample
  (Gumbel-max over logits/temperature); scores accumulate -log p of the
  emitted token; sequences that emit EOS continue as PAD (reference quirk
  §8.9 fixed, same as the XLA path).

Attention layout: the KV cache is [T, B, D] (lane dim = model dim = a
multiple of 128 at flagship size); per-head score/value contractions are
expressed as full-width VPU elementwise ops plus two tiny MXU "segment"
matmuls against the head-membership matrix E[d, h] = (d // head_dim == h),
so nothing ever leaves VMEM and no per-head batched matmul loop is needed.

Eligibility is budgeted by ``supports_fused_decode`` (transformer decoder,
cache + weights fit in VMEM); callers fall back to the XLA while_loop path
otherwise (e.g. the 256-sequence service batch or the scaled L=512 config).

RNG: the TPU hardware PRNG (pltpu.prng_*), seeded from the caller's JAX
key — statistically equivalent multinomial sampling, not bit-identical to
``jax.random.categorical``. Greedy and teacher-forced modes are exactly
deterministic and are cross-checked against the XLA path in
tests/test_fused_decode.py (interpreter mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..midi.vocab import EOS_ID, PAD_ID, SOS_ID
from ..models.transformer import positional_encodings

_NEG_INF = -1e30

# Conservative VMEM budget (bytes) for cache + weights + activations;
# v5e has ~16 MiB/core and Mosaic needs headroom for double buffering.
_VMEM_BUDGET = 12 * 1024 * 1024

# Bisection depth for the support-filter threshold search (see
# filter_support): 32 halvings close the full int32 key range exactly.
_FILTER_ITERS = 32


def _tile_fits(config, batch: int, max_len: int, mode: str = "sample",
               filtered: bool = False) -> bool:
    """VMEM footprint check for one batch tile of the kernel.

    ``mode="forced"`` adds the per-step logits output buffer
    ([max_len, batch, V] f32) that teacher-forced mode writes — without it
    a forced-mode tile could pass this check yet exceed VMEM in Mosaic
    (~4.9 MB extra at flagship B=32/T=130/V=293). ``filtered`` budgets the
    top-k/top-p bisection's [B, V] transients — counted once per unrolled
    iteration because Mosaic's scoped-VMEM liveness does not reliably
    reuse buffers across an unrolled loop (measured: the earlier pairwise
    formulation's per-chunk [B, V, 64] transients accumulated to a 31 MB
    scoped allocation at B=32 despite a 12 MB static estimate)."""
    dc = config.decoder_config
    tc = dc.transformer_config
    d, L, V = tc.model_size, tc.num_layers, dc.output_dim
    itemsize = 2 if config.dtype == "bfloat16" else 4
    cache = 2 * L * max_len * batch * d * itemsize
    ffn = d * d * tc.ffn_multiplier  # elements; itemsize applied below
    weights = L * (4 * d * d + 2 * ffn) * itemsize + 2 * V * d * 4
    act = 6 * max_len * batch * d * itemsize + 4 * batch * V * 4
    if mode == "forced":
        act += max_len * batch * V * 4  # full logits output lives in VMEM
    if filtered:
        # keys + probs once, plus one [B, V] i32 mask transient per
        # unrolled bisection iteration (x2: top-k and top-p both on).
        act += (4 + 2 * _FILTER_ITERS) * batch * V * 4
    return cache + weights + act < _VMEM_BUDGET


def select_batch_tile(
    config, batch: int, max_len: int, mode: str = "sample",
    filtered: bool = False,
) -> Optional[int]:
    """Pick the batch-tile size: the whole batch when it fits (grid of 1 —
    the fast path), else the largest multiple-of-8 divisor of ``batch``
    whose per-tile cache+weights+activations fit VMEM. Rows are independent
    in decode, so tiles are exact, not an approximation.

    Alignment note: unaligned batch sizes are CORRECT either way (Mosaic
    pads the sublane dim — the B=1 p50-latency path runs this kernel on
    hardware); the multiple-of-8 preference in the tile search only avoids
    paying that padding waste times the grid count, so unaligned divisors
    are admitted as a last resort before giving up (e.g. B=12 tiles as
    2x6). Returns None when no admissible tile exists."""
    if _tile_fits(config, batch, max_len, mode, filtered):
        return batch
    for tile in range(batch // 2, 7, -1):
        if batch % tile == 0 and tile % 8 == 0 and _tile_fits(
            config, tile, max_len, mode, filtered
        ):
            return tile
    for tile in range(batch // 2, 0, -1):  # unaligned fallback
        if batch % tile == 0 and _tile_fits(config, tile, max_len, mode,
                                            filtered):
            return tile
    return None


def supports_fused_decode(
    config, batch: int, max_len: int, max_grid: Optional[int] = None,
    mode: str = "sample", filtered: bool = False,
) -> bool:
    """True when the decoder fits this kernel: transformer type, head_dim
    divides lanes cleanly, and some batch tile fits the VMEM budget.

    ``max_grid`` bounds the number of sequential batch tiles. Tiles
    sequentialize the decode loop (grid g = g * max_len small steps), so
    the kernel only beats the XLA while_loop while per-step cost is
    dispatch-bound — measured on v5e at the flagship config: 2.3x faster
    at grid 1, still ahead at grid 2, LOSING by ~1.3x at grid 8 (the
    256-row service batch, where the XLA loop's big-batch matmuls win).
    Auto-selection (inference/decode.py) passes max_grid=2; pass None to
    ask about capability alone."""
    dc = config.decoder_config
    if getattr(dc, "decoder_type", "transformer") == "lstm":
        return False
    if getattr(dc, "class_conditioning", "initial") != "initial":
        # Per-step class conditioning adds a per-row bias to every in-kernel
        # token embedding; the kernel does not carry that input, so such
        # configs run the XLA while_loop decode (decode.decode_sampled).
        return False
    tc = dc.transformer_config
    if tc.model_size % tc.num_heads != 0 or tc.model_size % 128 != 0:
        return False
    tile = select_batch_tile(config, batch, max_len, mode, filtered)
    if tile is None:
        return False
    return max_grid is None or batch // tile <= max_grid


def _gather_weights(params, config, cdtype):
    """Flatten the flax decoder params into the kernel's input list.

    Layout per layer (16 arrays): w_q, b_q, w_k, b_k, w_v, b_v, w_o, b_o,
    ln1_scale, ln1_bias, ff1_w, ff1_b, ff2_w, ff2_b, ln2_scale, ln2_bias.
    LN params and the vocab head stay f32 (flax computes LN in f32 and
    output_layer is an f32 Dense); everything else is cast to the model's
    compute dtype, matching flax Dense/Embed dtype casting.
    """
    dec = params["decoder"]
    stack = dec["decoder"]
    tc = config.decoder_config.transformer_config

    def c(x):
        return jnp.asarray(x, cdtype)

    def r2(x):  # biases / LN vectors as [1, N] (2-D for Mosaic)
        return jnp.reshape(x, (1, -1))

    ws = [c(dec["token_emb"]["embedding"])]
    for i in range(tc.num_layers):
        layer = stack[f"layer{i}"]
        att = layer["attention"]
        for lin in ("w_q", "w_k", "w_v", "w_o"):
            ws.append(c(att[lin]["kernel"]))
            ws.append(c(r2(att[lin]["bias"])))
        ws.append(r2(jnp.asarray(layer["ln1"]["scale"], jnp.float32)))
        ws.append(r2(jnp.asarray(layer["ln1"]["bias"], jnp.float32)))
        ws.append(c(layer["ff"]["ff1"]["kernel"]))
        ws.append(c(r2(layer["ff"]["ff1"]["bias"])))
        ws.append(c(layer["ff"]["ff2"]["kernel"]))
        ws.append(c(r2(layer["ff"]["ff2"]["bias"])))
        ws.append(r2(jnp.asarray(layer["ln2"]["scale"], jnp.float32)))
        ws.append(r2(jnp.asarray(layer["ln2"]["bias"], jnp.float32)))
    ws.append(jnp.asarray(dec["output_layer"]["kernel"], jnp.float32))
    ws.append(r2(jnp.asarray(dec["output_layer"]["bias"], jnp.float32)))
    return ws


def _float_sort_keys(x: jax.Array) -> jax.Array:
    """Monotone f32 -> int32 keys: signed-int compare == float compare.

    Standard radix-sort transform: non-negatives keep their bit pattern
    (already ascending as ints); negatives get their magnitude bits
    flipped so more-negative floats map to smaller ints. -0.0 is first
    canonicalized to +0.0 (the two zeros compare equal as floats but
    would land one key apart) via a ``where`` — an ``x + 0.0`` would be
    correct IEEE but is exactly the identity XLA licenses itself to
    fold away."""
    x = jnp.where(x == 0.0, 0.0, x)
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return i ^ (jax.lax.shift_right_arithmetic(i, 31) & 0x7FFFFFFF)


def _threshold_key(keys: jax.Array, weights: jax.Array,
                   bound: float) -> jax.Array:
    """Per row: the minimal int32 t with sum(weights[keys > t]) < bound.

    g(t) = strictly-above weighted mass is non-increasing in t, so the
    answer is found by bisection over the key space — ``_FILTER_ITERS``
    (=32) halvings close the full int32 range exactly. Branch-free, only
    [B, V] transients (the earlier pairwise-comparison formulation's 3-D
    chunks overflowed Mosaic's scoped VMEM at flagship batch). The
    midpoint is the overflow-safe ``(lo>>1)+(hi>>1)+(lo&hi&1)`` =
    floor((lo+hi)/2) — lo+hi itself spans 2^32 at the first step.

    Invariants: g(lo) >= bound, g(hi) < bound; both are maintained by the
    updates and hold initially (g(INT32_MIN) is the total mass, > bound
    for every caller: top_k < V and top_p < 1 <= total; g(INT32_MAX) = 0
    < bound). If the total-mass invariant ever failed, hi would converge
    toward INT32_MIN and the filter would keep everything — the benign
    direction."""
    B = keys.shape[0]
    lo = jnp.full((B, 1), np.iinfo(np.int32).min, jnp.int32)
    hi = jnp.full((B, 1), np.iinfo(np.int32).max, jnp.int32)
    for _ in range(_FILTER_ITERS):
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        g = jnp.sum(jnp.where(keys > mid, weights, 0.0), axis=-1,
                    keepdims=True)
        below = g < bound
        hi = jnp.where(below, mid, hi)
        lo = jnp.where(below, lo, mid)
    return hi


def filter_support(scaled: jax.Array, top_k: int, top_p: float) -> jax.Array:
    """Top-k / nucleus support restriction without sort or top_k gathers.

    Matches ``inference.decode._filter_logits`` (same keep sets, applied to
    the same temperature-scaled logits) with order statistics recast as
    threshold searches — Mosaic has no sort/argpartition, so each cutoff
    value is found by bisection over float-ordered int keys instead:

    - top-k: token i survives iff fewer than k tokens are STRICTLY greater
      (exactly "x >= k-th largest counting duplicates", ties kept — the
      XLA path's ``logits < kth`` arithmetic). keys >= t with t the minimal
      key whose strictly-above COUNT is < k is the same set.
    - top-p: token i survives iff the probability mass of strictly-greater
      tokens is < top_p (exactly the sorted-cumsum "mass before the first
      occurrence" rule; the argmax always survives). Computed over the
      post-top-k distribution, like the XLA path. Equal keep sets in real
      arithmetic; f32 summation-order differences vs the cumsum can flip a
      token whose boundary distance is below rounding (~1e-6 mass).
    """
    if top_k > 0 and top_k < scaled.shape[-1]:
        keys = _float_sort_keys(scaled)
        t = _threshold_key(keys, jnp.ones_like(scaled), float(top_k))
        scaled = jnp.where(keys >= t, scaled, _NEG_INF)
    if 0.0 < top_p < 1.0:
        keys = _float_sort_keys(scaled)  # post-top-k order
        m = jnp.max(scaled, axis=-1, keepdims=True)
        ex = jnp.exp(scaled - m)  # filtered rows underflow to exactly 0
        probs = ex / jnp.sum(ex, axis=-1, keepdims=True)
        t = _threshold_key(keys, probs, top_p)
        scaled = jnp.where(keys >= t, scaled, _NEG_INF)
    return scaled


def _layer_norm(x32, scale_ref, bias_ref, cdtype):
    """flax nn.LayerNorm semantics: all-f32 math, cast at the end."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    cen = x32 - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    y = cen * jax.lax.rsqrt(var + 1e-6)
    return (y * scale_ref[0, :] + bias_ref[0, :]).astype(cdtype)


def _dense(x, w_ref, b_ref, cdtype):
    """flax nn.Dense(dtype=cdtype): cdtype matmul (f32 accumulate on MXU),
    result cast back to cdtype, then the cdtype bias add."""
    y = jnp.dot(x, w_ref[:, :], preferred_element_type=jnp.float32)
    return y.astype(cdtype) + b_ref[0, :]


def _head_matrix(d: int, h: int, dtype):
    """E[d, h] = 1 where lane d belongs to head h (built in-kernel)."""
    hd = d // h
    lanes = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
    heads = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
    return (lanes // hd == heads).astype(dtype)


def _make_kernel(config, B, T, mode, cdtype, top_k=0, top_p=0.0):
    """Build the kernel body for a static (config, batch, max_len, mode).

    ``top_k``/``top_p`` restrict the sampling support (sample mode only;
    greedy's argmax is filter-invariant and forced mode emits given
    tokens) — see ``filter_support``."""
    tc = config.decoder_config.transformer_config
    D = tc.model_size
    H = tc.num_heads
    HDIM = D // H
    V = config.decoder_config.output_dim
    NL = tc.num_layers
    FF = D * tc.ffn_multiplier
    scale = float(np.sqrt(D))
    att_scale = float(1.0 / np.sqrt(HDIM))

    def layer_step(x, t, layer_ws, ck_ref, cv_ref, e_mat, et_mat, t_iota):
        """One transformer layer at position t. x: [B, D] cdtype."""
        (wq, bq, wk, bk, wv, bv, wo, bo,
         ln1s, ln1b, ff1w, ff1b, ff2w, ff2b, ln2s, ln2b) = layer_ws
        q = _dense(x, wq, bq, cdtype)  # [B, D]
        k = _dense(x, wk, bk, cdtype)
        v = _dense(x, wv, bv, cdtype)
        ck_ref[pl.ds(t, 1), :, :] = k[None]
        cv_ref[pl.ds(t, 1), :, :] = v[None]

        # Scores: s[tau, b, h] = sum_d K[tau,b,d] q[b,d] E[d,h] / sqrt(hd)
        p = ck_ref[:, :, :] * q[None, :, :]  # [T, B, D] VPU
        s = jnp.dot(
            p.reshape(T * B, D), e_mat, preferred_element_type=jnp.float32
        ).reshape(T, B, H) * att_scale
        # Match the flax step path: bf16 logits when cdtype is bf16
        # (jnp.einsum there stays in q.dtype), softmax then in that dtype.
        s = s.astype(cdtype).astype(jnp.float32)
        valid = (t_iota <= t)[:, None, None]  # cache slots written so far
        s = jnp.where(valid, s, _NEG_INF)
        m = jnp.max(s, axis=0, keepdims=True)
        ex = jnp.exp(s - m)
        probs = (ex / jnp.sum(ex, axis=0, keepdims=True)).astype(cdtype)
        # Out: o[b, d] = sum_tau probs[tau, b, head(d)] V[tau, b, d]
        pfull = jnp.dot(
            probs.reshape(T * B, H), et_mat, preferred_element_type=jnp.float32
        ).astype(cdtype).reshape(T, B, D)
        o = jnp.sum(
            (pfull * cv_ref[:, :, :]).astype(jnp.float32), axis=0
        ).astype(cdtype)
        att = _dense(o, wo, bo, cdtype)

        x = _layer_norm((x + att).astype(jnp.float32), ln1s, ln1b, cdtype)
        ff = _dense(x, ff1w, ff1b, cdtype)
        ff = jnp.maximum(ff, 0)
        ff = _dense(ff, ff2w, ff2b, cdtype)
        return _layer_norm((x + ff).astype(jnp.float32), ln2s, ln2b, cdtype)

    def kernel(*refs):
        # Inputs: seed(SMEM), temp(SMEM), x0, pos, forced, emb, 16 per layer,
        # head_w, head_b. Outputs: seqs [T, B], scores [B, 1]
        # (+ logits [T, B, V] in forced mode). Scratch: 2*NL cache refs.
        (seed_ref, temp_ref, x0_ref, pos_ref, forced_ref, emb_ref), rest = (
            refs[:6], refs[6:]
        )
        layer_refs = [rest[16 * i : 16 * (i + 1)] for i in range(NL)]
        rest = rest[16 * NL :]
        head_w_ref, head_b_ref = rest[:2]
        rest = rest[2:]
        if mode == "forced":
            seqs_ref, scores_ref, logits_ref = rest[:3]
            rest = rest[3:]
        else:
            seqs_ref, scores_ref = rest[:2]
            rest = rest[2:]
        # Scratch: per-layer caches, then the [1, B] done-mask row.
        # Loop-carried VECTOR state does not legalize through Mosaic's
        # scf.while lowering — only scalars ride the while carry; the
        # per-row done mask and running scores live in VMEM refs, and the
        # previous token is re-read from seqs_ref (exactly what the XLA
        # path does with its seqs array).
        cache_refs = [(rest[2 * i], rest[2 * i + 1]) for i in range(NL)]
        done_ref = rest[2 * NL]

        if mode == "sample":
            # Decorrelate batch tiles: each grid step draws its own stream.
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

        # Zero-init caches and outputs: scratch/output VMEM is uninitialized
        # (NaN-filled in interpret mode), the value contraction multiplies
        # masked probabilities (0) into unwritten cache rows, and an early
        # EOS exit leaves tail rows of seqs/logits unwritten.
        for ck, cv in cache_refs:
            ck[:, :, :] = jnp.zeros((T, B, D), ck.dtype)
            cv[:, :, :] = jnp.zeros((T, B, D), cv.dtype)
        seqs_ref[:, :] = jnp.full((T, B), PAD_ID, jnp.int32)
        done_ref[:, :] = jnp.zeros((1, B), jnp.int32)
        scores_ref[:, :] = jnp.zeros((1, B), jnp.float32)
        if mode == "forced":
            logits_ref[:, :, :] = jnp.zeros((T, B, V), jnp.float32)

        e_mat = _head_matrix(D, H, cdtype)
        et_mat = e_mat.T
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)[:, 0]
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)

        def run_stack(x, t):
            for lws, (ck, cv) in zip(layer_refs, cache_refs):
                x = layer_step(x, t, lws, ck, cv, e_mat, et_mat, t_iota)
            return x

        # Position 0: the conditioning state; head output unused.
        x0 = scale * x0_ref[:, :].astype(cdtype) + pos_ref[0, :].astype(cdtype)
        run_stack(x0, 0)
        seqs_ref[0, :] = jnp.full((B,), SOS_ID, jnp.int32)

        def step(carry):
            t, _ = carry
            last = seqs_ref[pl.ds(t - 1, 1), :][0]
            done = done_ref[0, :] != 0
            scores = scores_ref[0, :]
            onehot = (v_iota == last[:, None]).astype(cdtype)
            x = jnp.dot(onehot, emb_ref[:, :],
                        preferred_element_type=jnp.float32).astype(cdtype)
            x = scale * x + pos_ref[pl.ds(t, 1), :][0].astype(cdtype)
            h = run_stack(x, t)
            logits = jnp.dot(
                h.astype(jnp.float32), head_w_ref[:, :],
                preferred_element_type=jnp.float32,
            ) + head_b_ref[0, :]  # [B, V] f32

            if mode == "forced":
                logits_ref[pl.ds(t, 1), :, :] = logits[None]
                nxt = forced_ref[pl.ds(t, 1), :][0]
            elif mode == "greedy":
                nxt = _argmax_lanes(logits, v_iota)
            else:
                scaled = logits / temp_ref[0, 0]
                if top_k > 0 or top_p > 0.0:
                    scaled = filter_support(scaled, top_k, top_p)
                bits = pltpu.prng_random_bits((B, V))
                gumbel = -jnp.log(-jnp.log(_uniform_from_bits(bits)))
                nxt = _argmax_lanes(scaled + gumbel, v_iota)

            m = jnp.max(logits, axis=-1, keepdims=True)
            lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1)) + m[:, 0]
            tok_logit = jnp.sum(
                jnp.where(v_iota == nxt[:, None], logits, 0.0), axis=-1
            )
            step_nll = lse - tok_logit  # -log p of the emitted token
            scores_ref[0, :] = scores + jnp.where(done, 0.0, step_nll)
            if mode == "forced":
                new_done = done
            else:
                new_done = done | (nxt == EOS_ID)
                nxt = jnp.where(done, PAD_ID, nxt)
            done_ref[0, :] = new_done.astype(jnp.int32)
            seqs_ref[pl.ds(t, 1), :] = nxt[None]
            return t + 1, jnp.all(new_done).astype(jnp.int32)

        def cond(carry):
            t, all_done = carry
            return (t < T) & (all_done == 0)

        jax.lax.while_loop(
            cond, step, (jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32))
        )

    return kernel


def _uniform_from_bits(bits):
    """int32 random bits -> uniforms in (0, 1).

    ``pltpu.prng_random_bits`` is TYPED int32, so a plain ``bits >> 8``
    would be an arithmetic shift keeping the sign: ~half the "uniforms"
    would come out negative and ``-log(-log(u))`` NaN, poisoning the
    whole Gumbel-max draw. Mask to the low 23 bits instead (sign-free),
    scale by 2^-23 and offset by 2^-24: every value is exactly
    representable in f32 and u lies strictly in (0, 1) — a 24-bit mask
    would round its top value to exactly 1.0 (ulp below 1 is 2^-24),
    making the Gumbel +inf.
    """
    return (bits & 0x7FFFFF).astype(jnp.float32) * (2.0 ** -23) + 2.0 ** -24


def _argmax_lanes(x, lane_iota):
    """First-occurrence argmax over the lane axis (jnp.argmax semantics)."""
    m = jnp.max(x, axis=-1, keepdims=True)
    hit = x >= m
    big = jnp.asarray(np.iinfo(np.int32).max, jnp.int32)
    return jnp.min(jnp.where(hit, lane_iota, big), axis=-1)


@functools.partial(
    jax.jit,
    static_argnums=(0, 3),
    static_argnames=("max_len", "mode", "interpret", "batch_tile",
                     "top_k", "top_p"),
)
def fused_decode(
    config,
    params,
    x0: jax.Array,
    max_len: int,
    seed: jax.Array,
    temperature: float = 1.0,
    mode: str = "sample",
    forced_tokens: Optional[jax.Array] = None,
    interpret: bool = False,
    batch_tile: Optional[int] = None,
    top_k: int = 0,
    top_p: float = 0.0,
):
    """Run the fused decode kernel.

    config: ModelConfig (static/hashable); params: the StyleVAE param tree;
    x0: [B, D] conditioning state (``VAEDecoder.initial_state(z, classes)``);
    seed: int32 scalar array seeding the TPU PRNG (``mode="sample"`` only).

    mode: "sample" (Gumbel-max multinomial), "greedy" (argmax), or
    "forced" (teacher-forced: emits ``forced_tokens`` and returns the
    per-step logits — the parity-test hook). ``top_k``/``top_p`` restrict
    the sampling support in sample mode (see ``filter_support``); scores
    still accumulate -log p under the unfiltered, untempered distribution,
    matching the XLA loop.

    Batches whose KV cache exceeds the VMEM budget are processed as a
    sequential Pallas grid over independent batch tiles (weights stay
    resident; each tile re-runs the decode loop on its rows) — one kernel
    launch regardless of batch size. ``batch_tile`` overrides the tile
    choice (must divide the batch and fit VMEM; mainly for tests).

    Returns (seqs [B, max_len], scores [B]) — and logits [B, max_len, V]
    as a third element in forced mode (position 0 row is zeros).
    """
    tc = config.decoder_config.transformer_config
    D, V, NL = tc.model_size, config.decoder_config.output_dim, tc.num_layers
    B = x0.shape[0]
    T = max_len
    cdtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32

    filtered = mode == "sample" and (top_k > 0 or top_p > 0.0)
    Bt = batch_tile if batch_tile is not None else select_batch_tile(
        config, B, T, mode, filtered
    )
    if Bt is None or B % Bt != 0:
        raise ValueError(
            f"no admissible batch tile for B={B}, T={T} "
            f"(requested {batch_tile})"
        )
    grid = B // Bt

    ws = _gather_weights(params, config, cdtype)
    pos = jnp.asarray(positional_encodings(D, T), jnp.float32)
    if forced_tokens is None:
        forced = jnp.zeros((T, B), jnp.int32)
    else:
        forced = forced_tokens.T.astype(jnp.int32)

    kernel = _make_kernel(config, Bt, T, mode, cdtype, top_k, top_p)

    # Batch tiles ride a LEADING grid dimension (squeezed out of the kernel
    # refs via block size None) so every in-kernel block keeps its full
    # trailing dims — Mosaic requires blocked trailing dims to be
    # (8, 128)-aligned, which a batch-sliced lane/sublane dim is not.
    G = grid
    x0_tiled = x0.reshape(G, Bt, D)  # tile g = rows [g*Bt, (g+1)*Bt)
    forced_tiled = forced.reshape(T, G, Bt).transpose(1, 0, 2)  # [G, T, Bt]

    out_shape = [
        jax.ShapeDtypeStruct((G, T, Bt), jnp.int32),  # seqs (transposed)
        jax.ShapeDtypeStruct((G, 1, Bt), jnp.float32),  # scores (row vector)
    ]
    out_specs = [
        pl.BlockSpec((None, T, Bt), lambda i: (i, 0, 0)),
        pl.BlockSpec((None, 1, Bt), lambda i: (i, 0, 0)),
    ]
    if mode == "forced":
        out_shape.append(jax.ShapeDtypeStruct((G, T, Bt, V), jnp.float32))
        out_specs.append(pl.BlockSpec((None, T, Bt, V), lambda i: (i, 0, 0, 0)))

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)  # full array every step
    n_weights = len(ws)

    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=out_shape,
        in_specs=[
            smem,  # seed
            smem,  # temperature
            pl.BlockSpec((None, Bt, D), lambda i: (i, 0, 0)),  # x0
            vmem,  # positional table
            pl.BlockSpec((None, T, Bt), lambda i: (i, 0, 0)),  # forced
        ] + [vmem] * n_weights,
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((T, Bt, D), cdtype) for _ in range(2 * NL)]
            + [pltpu.VMEM((1, Bt), jnp.int32)]  # done mask
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(seed, jnp.int32), (1, 1)),
        jnp.full((1, 1), temperature, jnp.float32),
        x0_tiled,
        pos,
        forced_tiled,
        *ws,
    )
    # [G, T, Bt] -> [T, B] -> [B, T] (row b = g*Bt + j).
    seqs = outs[0].transpose(1, 0, 2).reshape(T, B).T
    scores = outs[1].reshape(B)
    if mode == "forced":
        logits = outs[2].transpose(1, 0, 2, 3).reshape(T, B, V)
        return seqs, scores, logits.transpose(1, 0, 2)
    return seqs, scores
