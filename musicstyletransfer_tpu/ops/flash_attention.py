"""Pallas TPU fused attention (flash-attention style, online softmax).

The hot kernel of the transformer stacks (reference hot path:
transformer.py:79-104, eager per-op attention with debug prints). This
kernel fuses QK^T, masking (padding + causal), the online-softmax
normalization, and the value contraction into one VMEM-resident pass —
no [T, T] probability matrix ever hits HBM.

Layout: per-(batch*head) grid row, q processed in blocks. Two regimes:

- T < _STREAM_THRESHOLD: the full K/V for the head stays VMEM-resident
  (grid (BH, num_q); cheapest at short/medium lengths).
- T >= _STREAM_THRESHOLD: K/V blocks STREAM from HBM via a third grid
  dimension — online-softmax accumulators live in VMEM scratch that
  persists across the innermost k axis, so VMEM use is O(block) and the
  kernel scales to T = 32k+. Causal runs clamp the K/V index map at the
  diagonal, so beyond-diagonal blocks resolve to the same block index and
  Mosaic skips their DMA entirely (no wasted bandwidth).

Training: wrapped in jax.custom_vjp; the backward recomputes probability
blocks from the saved per-row logsumexp — rematerializing FLOPs to keep
memory O(T), the right trade on TPU where HBM bandwidth is the bottleneck.
The resident regime runs dQ/dK/dV in ONE single-pass kernel
(``_dqkv_kernel``, round 4 — each recomputed P block feeds all three
gradients); the streaming regime keeps the split dQ / dK-dV kernel pair,
whose operand re-reads are what the third grid axis already streams.
The model layer engages flash at T >= TransformerConfig.flash_min_seq_len
(see BASELINE.md for the measured crossover).

Numerical contract: matches ``reference_attention`` (plain XLA) to ~1e-5
(f32); tests run the kernel in interpreter mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def should_interpret() -> bool:
    """True when compute lands on CPU (Mosaic only compiles for TPU).

    Honors ``jax.default_device`` contexts (which don't change
    ``jax.default_backend()`` — the TPU plugin keeps registry priority even
    when computation is pinned to CPU).
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform == "cpu"
    return jax.default_backend() == "cpu"


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_lens: jax.Array,
    causal: bool,
    sm_scale: float,
) -> jax.Array:
    """Plain-XLA attention, the numerical ground truth and CPU fallback.

    q, k, v: [B, H, T, D]; key_lens: [B] valid (prefix) key counts.
    """
    T = q.shape[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
    mask = jnp.arange(T)[None, :] < key_lens[:, None]  # [B, T_k]
    bias = jnp.where(mask[:, None, None, :], 0.0, _NEG_INF)
    if causal:
        tri = jnp.tril(jnp.ones((T, T), bool))
        bias = bias + jnp.where(tri[None, None], 0.0, _NEG_INF)
    probs = jax.nn.softmax(logits + bias.astype(logits.dtype), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _flash_kernel(
    lens_ref,  # SMEM [1, 1] valid key count for this (b, h)
    q_ref,  # VMEM [block_q, D]
    k_ref,  # VMEM [T, D]
    v_ref,  # VMEM [T, D]
    o_ref,  # VMEM [block_q, D]
    lse_ref,  # VMEM [block_q, 1] logsumexp residual for the backward pass
    *,
    block_q: int,
    block_k: int,
    seq_len: int,
    causal: bool,
    sm_scale: float,
):
    qi = pl.program_id(1)
    valid_len = lens_ref[0, 0]
    q = q_ref[:] * jnp.asarray(sm_scale, q_ref.dtype)  # [bq, D], native dtype
    D = q.shape[-1]

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    # Dynamic upper bound: skip fully-padded k blocks, and (causal) blocks
    # strictly above the diagonal — they contribute nothing.
    num_k_blocks = pl.cdiv(jnp.minimum(valid_len, seq_len), block_k)
    if causal:
        last_q_pos = (qi + 1) * block_q
        num_k_blocks = jnp.minimum(num_k_blocks, pl.cdiv(last_q_pos, block_k))

    def body(ki, carry):
        acc, m, l = carry
        kblk = k_ref[pl.ds(ki * block_k, block_k), :]
        vblk = v_ref[pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kblk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk] f32 out of the MXU
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = k_pos < valid_len
        if causal:
            mask = mask & (k_pos <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # Zero masked entries explicitly: when a whole block is masked,
        # exp(s - m_new) would be exp(0) = 1, not 0.
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        scale = jnp.exp(m - m_new)
        l_new = l * scale + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale + jax.lax.dot_general(
            p.astype(vblk.dtype), vblk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((block_q, D), jnp.float32)
    m = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc, m, l))
    # Fully-masked query rows (padding) have l == 0; emit zeros safely.
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(jnp.maximum(l, 1e-30))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6)
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_lens: jax.Array,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention. q, k, v: [B, H, T, D]; key_lens: [B].

    Keys/queries beyond ``key_lens[b]`` are masked; fully-masked query rows
    return zeros (they are dropped by downstream masking anyway).
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    out, _lse = _flash_forward_with_lse(
        q, k, v, key_lens, causal, sm_scale, interpret
    )
    return out


# Max q/k block edge for the resident regime. Probed on v5e (fwd+bwd,
# causal bf16 B=8 H=8 D=64, interleaved medians, round 4): 512 beats 256
# at BOTH T=512 (2.74 vs 2.93 ms) and T=2048 (5.89 vs 6.60 ms) — fewer
# grid programs and bigger MXU tiles beat the finer causal-skip
# granularity at every resident size. 1024 blows the 16 MB scoped-VMEM
# budget in the combined backward ([bq,bk] f32 tiles + the dK/dV
# accumulators) and fails to compile at T=2048.
_MAX_BLOCK = 512

# At/above this padded length, K/V stream from HBM block-by-block instead
# of living whole in VMEM (the resident path's footprint grows linearly
# with T and stops compiling around T ~ 8k at D=64 once the backward's
# full-T q/do blocks are added).
_STREAM_THRESHOLD = 8192
# Streaming tile edge. Measured on v5e (fwd+bwd, causal bf16 B=8 H=8
# D=64): 1024 beats 512 by 1.24x at T=8192 and 1.29x at 16384 (256 is
# 2.8-3x WORSE — grid/DMA overhead dominates small tiles). 2048 would
# put the [bq, bk] f32 score tile at 16 MB, over VMEM; 1024 (4 MB) is
# the practical maximum at D=64.
_STREAM_BLOCK = 1024


def _block_for(T: int) -> int:
    """512 was the measured winner at T=512/2048 (header comment), but at
    T = 4096 the combined resident backward's scoped VMEM — full-T K/V,
    dK/dV outputs, the f32 dK/dV accumulators AND the 512-wide f32
    s/p/dp/ds tiles, all live at once — reaches 17.69 MB and Mosaic
    refuses the 16 MB budget (caught by the round-4 bench, which
    compiled the pre-existing T=4096 case against the new block size for
    the first time). 256 keeps T=4096 compiling; the 512 win stands
    where it was measured."""
    if _round_up(T, 8) > 2048:
        return 256
    return min(_MAX_BLOCK, _round_up(T, 8))


def _flash_stream_kernel(
    lens_ref,  # SMEM [1, 1]
    q_ref,  # VMEM [block_q, D]
    k_ref,  # VMEM [block_k, D]  (streamed per grid step)
    v_ref,  # VMEM [block_k, D]
    o_ref,  # VMEM [block_q, D]
    lse_ref,  # VMEM [block_q, 1]
    acc_ref,  # scratch [block_q, D] f32, persists across the k grid axis
    m_ref,  # scratch [block_q, 1] f32
    l_ref,  # scratch [block_q, 1] f32
    *,
    block_q: int,
    block_k: int,
    num_k: int,
    causal: bool,
    sm_scale: float,
):
    """Streaming-K/V forward: grid (BH, num_q, num_k), k innermost.

    Same math as _flash_kernel's fori_loop body, but the loop IS the grid:
    each step sees one [block_k, D] K/V tile DMA'd to VMEM while the online
    softmax state rides scratch. Masked-out k blocks (padding past
    ``key_lens``, or causally above the diagonal) skip their update via
    ``pl.when``; causal ones also never pay DMA (clamped index map)."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    valid_len = lens_ref[0, 0]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    active = ki * block_k < valid_len
    if causal:
        active = active & (ki * block_k <= (qi + 1) * block_q - 1)

    @pl.when(active)
    def _update():
        q = q_ref[:] * jnp.asarray(sm_scale, q_ref.dtype)
        s = jax.lax.dot_general(
            q, k_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = k_pos < valid_len
        if causal:
            mask = mask & (k_pos <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)
        m = m_ref[...]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        scale = jnp.exp(m - m_new)
        l_ref[...] = l_ref[...] * scale + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * scale + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = m_new

    @pl.when(ki == num_k - 1)
    def _finalize():
        l = jnp.maximum(l_ref[...], 1e-30)
        o_ref[:] = (acc_ref[...] / l).astype(o_ref.dtype)
        lse_ref[:] = m_ref[...] + jnp.log(l)


def _stream_kv_index_map(block_q: int, block_k: int, causal: bool):
    """K/V BlockSpec index map for the streaming grids. Causal clamps ki at
    the diagonal: beyond it the map repeats the previous block index, and
    Mosaic elides the DMA for a re-fetched block."""
    if not causal:
        return lambda bh, qi, ki: (bh, ki, 0)

    def clamped(bh, qi, ki):
        last = ((qi + 1) * block_q - 1) // block_k
        return (bh, jnp.minimum(ki, last), 0)

    return clamped


def _flash_forward_streaming(q, k, v, key_lens, causal, sm_scale, interpret):
    B, H, T, D = q.shape
    block_q = block_k = _STREAM_BLOCK
    T_pad = _round_up(T, _STREAM_BLOCK)
    if T_pad != T:
        pad = [(0, 0), (0, 0), (0, T_pad - T), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))

    BH = B * H
    qf = q.reshape(BH, T_pad, D)
    kf = k.reshape(BH, T_pad, D)
    vf = v.reshape(BH, T_pad, D)
    lens = jnp.repeat(key_lens.astype(jnp.int32), H).reshape(BH, 1, 1)
    num_q = T_pad // block_q
    num_k = T_pad // block_k

    kv_map = _stream_kv_index_map(block_q, block_k, causal)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_stream_kernel,
            block_q=block_q,
            block_k=block_k,
            num_k=num_k,
            causal=causal,
            sm_scale=sm_scale,
        ),
        grid=(BH, num_q, num_k),
        in_specs=[
            pl.BlockSpec((None, 1, 1), lambda bh, qi, ki: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, block_q, D), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, D), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, D), kv_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, D), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T_pad, D), q.dtype),
            jax.ShapeDtypeStruct((BH, T_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lens, qf, kf, vf)
    out = out.reshape(B, H, T_pad, D)[:, :, :T, :]
    lse = lse.reshape(B, H, T_pad)[:, :, :T]
    return out, lse


def _flash_forward_with_lse(q, k, v, key_lens, causal, sm_scale, interpret):
    B, H, T, D = q.shape
    if _round_up(T, _STREAM_BLOCK) >= _STREAM_THRESHOLD:
        return _flash_forward_streaming(
            q, k, v, key_lens, causal, sm_scale, interpret
        )

    block_q = _block_for(T)
    block_k = _block_for(T)
    T_pad = _round_up(T, max(block_q, block_k))
    if T_pad != T:
        pad = [(0, 0), (0, 0), (0, T_pad - T), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    BH = B * H
    qf = q.reshape(BH, T_pad, D)
    kf = k.reshape(BH, T_pad, D)
    vf = v.reshape(BH, T_pad, D)
    lens = jnp.repeat(key_lens.astype(jnp.int32), H).reshape(BH, 1, 1)

    grid = (BH, T_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            block_q=block_q,
            block_k=block_k,
            seq_len=T_pad,
            causal=causal,
            sm_scale=sm_scale,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, 1), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T_pad, D), q.dtype),
            jax.ShapeDtypeStruct((BH, T_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lens, qf, kf, vf)
    out, lse = out
    out = out.reshape(B, H, T_pad, D)[:, :, :T, :]
    lse = lse.reshape(B, H, T_pad)[:, :, :T]
    return out, lse


def _dqkv_kernel(
    lens_ref,  # SMEM [1, 1]
    q_ref,  # VMEM [block_q, D]
    do_ref,  # VMEM [block_q, D]
    lse_ref,  # VMEM [block_q, 1]
    delta_ref,  # VMEM [block_q, 1]  rowsum(dO * O)
    k_ref,  # VMEM [T, D]
    v_ref,  # VMEM [T, D]
    dq_ref,  # VMEM [block_q, D]
    dk_ref,  # VMEM [T, D]   (same block every qi; written at the last qi)
    dv_ref,  # VMEM [T, D]
    dk_acc,  # scratch [T, D] f32, persists across the q grid axis
    dv_acc,  # scratch [T, D] f32
    *,
    block_q: int,
    block_k: int,
    seq_len: int,
    num_q: int,
    causal: bool,
    sm_scale: float,
):
    """Single-pass resident backward: dQ, dK and dV from ONE kernel.

    The split ``_dq_kernel`` + ``_dkv_kernel`` pair each recompute the
    S = QK^T blocks from scratch, so the resident backward paid the
    score-matrix matmul twice and read every operand (q, k, v, dO, lse,
    delta) twice from HBM. Here each recomputed P block feeds all three
    gradients — ~1/3 fewer backward matmul FLOPs, half the operand
    traffic, and one kernel dispatch instead of two. This is what moves
    fwd+bwd flash past XLA at short T (the T=512 regime where the split
    backward measured 0.90x, BENCH_r03). dK/dV ride f32 VMEM scratch
    that persists across the q-block grid axis and are written back once
    at the last q block.
    """
    qi = pl.program_id(1)
    valid_len = lens_ref[0, 0]

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # q pre-scaled: S blocks match the forward, and dsT @ q_scaled folds
    # the sm_scale that dK needs (dq applies its own scale at the end).
    q = q_ref[:].astype(jnp.float32) * sm_scale
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[:]
    delta = delta_ref[:]
    D = q.shape[-1]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )
    # Rows whose lse is the fully-masked sentinel (no visible key ANYWHERE
    # — ring off-diagonal calls produce these) contribute nothing to any
    # gradient; exp(s - sentinel) would overflow (see _dkv_stream_kernel).
    live_row = lse > -1e29

    num_k_blocks = pl.cdiv(jnp.minimum(valid_len, seq_len), block_k)
    if causal:
        num_k_blocks = jnp.minimum(
            num_k_blocks, pl.cdiv((qi + 1) * block_q, block_k)
        )

    def body(ki, dq):
        kblk = k_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        vblk = v_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kblk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = (k_pos < valid_len) & live_row
        if causal:
            mask = mask & (k_pos <= q_pos)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, vblk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        ks = pl.ds(ki * block_k, block_k)
        dv_acc[ks, :] = dv_acc[ks, :] + jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_acc[ks, :] = dk_acc[ks, :] + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq + jax.lax.dot_general(
            ds, kblk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(
        0, num_k_blocks, body, jnp.zeros((block_q, D), jnp.float32)
    )
    dq_ref[:] = (dq * sm_scale).astype(dq_ref.dtype)

    @pl.when(qi == num_q - 1)
    def _finalize():
        dk_ref[:] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[...].astype(dv_ref.dtype)


def _dq_stream_kernel(
    lens_ref,  # SMEM [1, 1]
    q_ref,  # VMEM [block_q, D]
    do_ref,  # VMEM [block_q, D]
    lse_ref,  # VMEM [block_q, 1]
    delta_ref,  # VMEM [block_q, 1]
    k_ref,  # VMEM [block_k, D] (streamed)
    v_ref,  # VMEM [block_k, D] (streamed)
    dq_ref,  # VMEM [block_q, D]
    dq_acc_ref,  # scratch [block_q, D] f32
    *,
    block_q: int,
    block_k: int,
    num_k: int,
    causal: bool,
    sm_scale: float,
):
    """Streaming dQ: grid (BH, num_q, num_k); same math as _dq_kernel's
    fori_loop body with the k loop as the grid's innermost axis."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    valid_len = lens_ref[0, 0]

    @pl.when(ki == 0)
    def _init():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)

    active = ki * block_k < valid_len
    if causal:
        active = active & (ki * block_k <= (qi + 1) * block_q - 1)

    @pl.when(active)
    def _update():
        q = q_ref[:].astype(jnp.float32) * sm_scale
        do = do_ref[:].astype(jnp.float32)
        kblk = k_ref[:].astype(jnp.float32)
        vblk = v_ref[:].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kblk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = k_pos < valid_len
        if causal:
            mask = mask & (k_pos <= q_pos)
        p = jnp.where(mask, jnp.exp(s - lse_ref[:]), 0.0)
        dp = jax.lax.dot_general(
            do, vblk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[:])
        dq_acc_ref[...] = dq_acc_ref[...] + jax.lax.dot_general(
            ds, kblk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == num_k - 1)
    def _finalize():
        dq_ref[:] = (dq_acc_ref[...] * sm_scale).astype(dq_ref.dtype)


def _dkv_stream_kernel(
    lens_ref,  # SMEM [1, 1]
    k_ref,  # VMEM [block_k, D]
    v_ref,  # VMEM [block_k, D]
    q_ref,  # VMEM [block_q, D] (streamed)
    do_ref,  # VMEM [block_q, D] (streamed)
    lse_ref,  # VMEM [block_q, 1] (streamed)
    delta_ref,  # VMEM [block_q, 1] (streamed)
    dk_ref,  # VMEM [block_k, D]
    dv_ref,  # VMEM [block_k, D]
    dk_acc_ref,  # scratch [block_k, D] f32
    dv_acc_ref,  # scratch [block_k, D] f32
    *,
    block_q: int,
    block_k: int,
    num_q: int,
    causal: bool,
    sm_scale: float,
):
    """Streaming dK/dV: grid (BH, num_k, num_q), q innermost; causal skips
    (and never DMAs, via the clamped q index map) query blocks strictly
    before this key block."""
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    valid_len = lens_ref[0, 0]

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    # Do NOT gate on qi vs valid_len: valid_len counts KEYS, and in ring
    # off-diagonal calls the query chunk is a different range entirely —
    # query rows at/after the key count still contribute dK/dV (same
    # invariant as _dqkv_kernel's lse-sentinel mask). Zero-visible-key rows
    # are dropped by that mask below; causal additionally skips query
    # blocks strictly before this key block.
    active = jnp.bool_(True)
    if causal:
        active = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(active)
    def _update():
        kblk = k_ref[:].astype(jnp.float32)
        vblk = v_ref[:].astype(jnp.float32)
        qblk = q_ref[:].astype(jnp.float32)
        doblk = do_ref[:].astype(jnp.float32)
        s = jax.lax.dot_general(
            qblk * sm_scale, kblk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = k_pos < valid_len
        if causal:
            mask = mask & (k_pos <= q_pos)
        # Zero-visible-key query rows only (lse sentinel) — see _dqkv_kernel.
        mask = mask & (lse_ref[:] > -1e29)
        p = jnp.where(mask, jnp.exp(s - lse_ref[:]), 0.0)
        dv_acc_ref[...] = dv_acc_ref[...] + jax.lax.dot_general(
            p, doblk, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doblk, vblk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[:])
        dk_acc_ref[...] = dk_acc_ref[...] + jax.lax.dot_general(
            ds, qblk, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == num_q - 1)
    def _finalize():
        dk_ref[:] = (dk_acc_ref[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[:] = dv_acc_ref[...].astype(dv_ref.dtype)


def _flash_backward_streaming(q, k, v, key_lens, lse, out, g, causal,
                              sm_scale, interpret, g_lse=None):
    B, H, T, D = q.shape
    block_q = block_k = _STREAM_BLOCK
    T_pad = _round_up(T, _STREAM_BLOCK)
    if T_pad != T:
        pad = [(0, 0), (0, 0), (0, T_pad - T), (0, 0)]
        q, k, v, out, g = (jnp.pad(x, pad) for x in (q, k, v, out, g))
        lse = jnp.pad(lse, [(0, 0), (0, 0), (0, T_pad - T)],
                      constant_values=_NEG_INF)
        if g_lse is not None:
            g_lse = jnp.pad(g_lse, [(0, 0), (0, 0), (0, T_pad - T)])

    BH = B * H
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if g_lse is not None:
        # lse cotangent: d lse_i / d s_ij = p_ij, so the extra term
        # g_lse_i * p_ij folds into the kernels' existing
        # ds = p * (dp - delta) as delta' = delta - g_lse.
        delta = delta - g_lse.astype(jnp.float32)
    qf, kf, vf, dof = (x.reshape(BH, T_pad, D) for x in (q, k, v, g))
    lsef = lse.reshape(BH, T_pad, 1)
    deltaf = delta.reshape(BH, T_pad, 1)
    lens = jnp.repeat(key_lens.astype(jnp.int32), H).reshape(BH, 1, 1)
    num_q = T_pad // block_q
    num_k = T_pad // block_k

    lens_spec = pl.BlockSpec((None, 1, 1), lambda bh, i, j: (bh, 0, 0),
                             memory_space=pltpu.SMEM)

    def by_i(bs, width=None):
        w = D if width is None else width
        return pl.BlockSpec((None, bs, w), lambda bh, i, j: (bh, i, 0),
                            memory_space=pltpu.VMEM)

    arb3 = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
    )

    # dQ: q-row blocks by grid axis 1, K/V streamed on axis 2 (causal
    # clamps the K/V map at the diagonal).
    kv_map = _stream_kv_index_map(block_q, block_k, causal)
    kv_spec = pl.BlockSpec((None, block_k, D), kv_map,
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(
            _dq_stream_kernel, block_q=block_q, block_k=block_k,
            num_k=num_k, causal=causal, sm_scale=sm_scale,
        ),
        grid=(BH, num_q, num_k),
        in_specs=[lens_spec, by_i(block_q), by_i(block_q),
                  by_i(block_q, 1), by_i(block_q, 1), kv_spec, kv_spec],
        out_specs=by_i(block_q),
        out_shape=jax.ShapeDtypeStruct((BH, T_pad, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=arb3,
        interpret=interpret,
    )(lens, qf, dof, lsef, deltaf, kf, vf)

    # dK/dV: key blocks on grid axis 1, q/do/lse/delta streamed on axis 2.
    # Causal clamps the q-side maps at this key block's FIRST needed q
    # block, so earlier (strictly-below-diagonal) q blocks never DMA.
    if causal:
        def q_map(bh, i, j):
            start = (i * block_k) // block_q
            return (bh, jnp.maximum(j, start), 0)
    else:
        def q_map(bh, i, j):
            return (bh, j, 0)

    def q_spec(width):
        return pl.BlockSpec((None, block_q, width), q_map,
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_stream_kernel, block_q=block_q, block_k=block_k,
            num_q=num_q, causal=causal, sm_scale=sm_scale,
        ),
        grid=(BH, num_k, num_q),
        in_specs=[lens_spec, by_i(block_k), by_i(block_k),
                  q_spec(D), q_spec(D), q_spec(1), q_spec(1)],
        out_specs=[by_i(block_k), by_i(block_k)],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T_pad, D), q.dtype),
            jax.ShapeDtypeStruct((BH, T_pad, D), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=arb3,
        interpret=interpret,
    )(lens, kf, vf, qf, dof, lsef, deltaf)

    def unpad(x):
        return x.reshape(B, H, T_pad, D)[:, :, :T, :]

    return unpad(dq), unpad(dk), unpad(dv)


def _flash_backward(q, k, v, key_lens, lse, out, g, causal, sm_scale,
                    interpret, g_lse=None):
    B, H, T, D = q.shape
    if _round_up(T, _STREAM_BLOCK) >= _STREAM_THRESHOLD:
        return _flash_backward_streaming(
            q, k, v, key_lens, lse, out, g, causal, sm_scale, interpret,
            g_lse=g_lse,
        )
    block_q = _block_for(T)
    block_k = block_q
    T_pad = _round_up(T, block_q)
    if T_pad != T:
        pad = [(0, 0), (0, 0), (0, T_pad - T), (0, 0)]
        q, k, v, out, g = (jnp.pad(x, pad) for x in (q, k, v, out, g))
        lse = jnp.pad(lse, [(0, 0), (0, 0), (0, T_pad - T)],
                      constant_values=_NEG_INF)
        if g_lse is not None:
            g_lse = jnp.pad(g_lse, [(0, 0), (0, 0), (0, T_pad - T)])

    BH = B * H
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if g_lse is not None:
        # See _flash_backward_streaming: delta' = delta - g_lse.
        delta = delta - g_lse.astype(jnp.float32)
    qf, kf, vf, dof = (x.reshape(BH, T_pad, D) for x in (q, k, v, g))
    lsef = lse.reshape(BH, T_pad, 1)
    deltaf = delta.reshape(BH, T_pad, 1)
    lens = jnp.repeat(key_lens.astype(jnp.int32), H).reshape(BH, 1, 1)

    num_q = T_pad // block_q
    row_spec = lambda bs: pl.BlockSpec((None, bs, D), lambda bh, i: (bh, i, 0),
                                       memory_space=pltpu.VMEM)
    col1_spec = lambda bs: pl.BlockSpec((None, bs, 1), lambda bh, i: (bh, i, 0),
                                        memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((None, T_pad, D), lambda bh, i: (bh, 0, 0),
                             memory_space=pltpu.VMEM)
    lens_spec = pl.BlockSpec((None, 1, 1), lambda bh, i: (bh, 0, 0),
                             memory_space=pltpu.SMEM)

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _dqkv_kernel, block_q=block_q, block_k=block_k, seq_len=T_pad,
            num_q=num_q, causal=causal, sm_scale=sm_scale,
        ),
        grid=(BH, num_q),
        in_specs=[lens_spec, row_spec(block_q), row_spec(block_q),
                  col1_spec(block_q), col1_spec(block_q), full_spec,
                  full_spec],
        out_specs=[row_spec(block_q), full_spec, full_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T_pad, D), q.dtype),
            jax.ShapeDtypeStruct((BH, T_pad, D), q.dtype),
            jax.ShapeDtypeStruct((BH, T_pad, D), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((T_pad, D), jnp.float32),
            pltpu.VMEM((T_pad, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lens, qf, dof, lsef, deltaf, kf, vf)

    def unpad(x):
        return x.reshape(B, H, T_pad, D)[:, :, :T, :]

    return unpad(dq), unpad(dk), unpad(dv)


def _flash_fwd(q, k, v, key_lens, causal, sm_scale, interpret):
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    out, lse = _flash_forward_with_lse(
        q, k, v, key_lens, causal, sm_scale, interpret
    )
    return out, (q, k, v, key_lens, lse, out)


def _flash_bwd(causal, sm_scale, interpret, residuals, g):
    q, k, v, key_lens, lse, out = residuals
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    dq, dk, dv = _flash_backward(
        q, k, v, key_lens, lse, out, g, causal, sm_scale, interpret
    )
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_lens: jax.Array,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
):
    """Fused attention returning ``(out, lse)`` — both differentiable.

    The per-row logsumexp output is what lets chunked/distributed callers
    (ops/ring_attention.py) merge partial softmaxes exactly; its cotangent
    is handled by folding ``g_lse`` into the backward kernels' ``delta``
    (``ds = p * (dp - (delta - g_lse))``), so the gradient through a merged
    combination is exact, not an approximation.

    Shapes as ``flash_attention``: q, k, v [B, H, T, D]; key_lens [B];
    lse [B, H, T] (f32; ``-1e30`` on fully-masked query rows).
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    return _flash_forward_with_lse(q, k, v, key_lens, causal, sm_scale,
                                   interpret)


def _flash_lse_fwd(q, k, v, key_lens, causal, sm_scale, interpret):
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    out, lse = _flash_forward_with_lse(
        q, k, v, key_lens, causal, sm_scale, interpret
    )
    return (out, lse), (q, k, v, key_lens, lse, out)


def _flash_lse_bwd(causal, sm_scale, interpret, residuals, cotangents):
    q, k, v, key_lens, lse, out = residuals
    g_out, g_lse = cotangents
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    dq, dk, dv = _flash_backward(
        q, k, v, key_lens, lse, out, g_out, causal, sm_scale, interpret,
        g_lse=g_lse,
    )
    return dq, dk, dv, None


flash_attention_with_lse.defvjp(_flash_lse_fwd, _flash_lse_bwd)
