"""Pallas TPU short-sequence attention core over the interleaved QKV
activation — the boundary-free companion to ops/flash_attention.py.

Why a second attention kernel exists (measured, BASELINE.md "Attention at
T<=512"): at T <= ~512 the streaming flash kernel matches XLA standalone
(0.975x) yet LOSES ~1.4x in-model, because its [B, H, T, D] calling
convention forces six materialized layout transposes per layer-unit and
its custom-VJP boundary cuts every fusion XLA would otherwise run into
the attention matmuls. XLA's own attention at these lengths is
HBM-roofline-bound on the [B, H, T, T] score tensor it materializes.

This kernel removes BOTH costs at once:

- It consumes the QKV projection's output **directly in its natural
  [B, T, H*(3*head_dim)] layout** (the projection's fused weight is
  column-permuted per head — transformer.py::_qkv_interleaved — which is
  free: a weight-side permutation instead of an activation-side
  transpose). No [B, H, T, D] arrays ever exist, forward or backward.
- Scores live only in VMEM: one grid step per (batch row, head group)
  computes the full [T, T] softmax attention for those heads — no
  online-softmax rescaling passes needed because T is small enough for
  the whole score tile to be resident (f32 [T, T] <= 4 MB at T = 1024,
  the hand-off point to the flash kernel).
- The custom-VJP residuals are the qkv activation itself (which the
  projection matmul materializes ANYWAY) plus the [B, H, T] logsumexp
  and the [B, T, D] context — there are no extra transposed copies for
  the boundary to save, so the boundary costs ~nothing.

Head grouping: Mosaic requires a block's last dim to be a multiple of
128 (or the full array width), so heads process in groups of the
smallest G with (G * 3 * head_dim) % 128 == 0 (G=2 at hd=64, G=4 at
hd=32; tiny test models fall back to G=H, whose block IS the full
width). The group loop is unrolled inside one grid step; grid =
(B, H / G).

The backward recomputes P from the saved lse (flash discipline: trade
FLOPs for HBM) and emits the gradient already assembled in the same
interleaved [B, T, H*(3*hd)] layout, so d(projection) is one plain XLA
matmul pair — no scatter, no transpose.

Reference hot path being replaced: the reference computes eager per-op
attention (transformer.py:79-104) — this kernel is where those FLOPs land
at the T < flash_min_seq_len regime of the scaled/wide configs.

Numerical contract: matches ``reference_core`` (plain XLA) to ~1e-5 in
f32; tests run interpreter mode on CPU (tests/test_attention_core.py)
and scripts/tpu-parity.py re-checks compiled-on-TPU at T=513 bf16.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# The resident [T, T] f32 score tile caps this kernel's reach; beyond it
# the streaming flash kernel is both necessary and faster (BASELINE.md
# long-sequence table). Kept in sync with flash_min_seq_len's default.
MAX_CORE_SEQ_LEN = 1024


def _head_group(num_heads: int, head_dim: int) -> int:
    """Smallest divisor G of num_heads with (G*3*head_dim) % 128 == 0 —
    the Mosaic lane-tiling constraint on the qkv block's last dim. Falls
    back to G = num_heads (the block then spans the full array width,
    which Mosaic always accepts)."""
    for g in range(1, num_heads + 1):
        if num_heads % g == 0 and (g * 3 * head_dim) % 128 == 0:
            return g
    return num_heads


def _core_fwd_kernel(
    lens_ref,  # SMEM [1, 1] valid key count for this batch row
    qkv_ref,  # VMEM [1, T, G*3*hd] this group's per-head [q | k | v]
    o_ref,  # VMEM [1, T, G*hd]
    lse_ref,  # VMEM [1, G, T, 1] per-row logsumexp residual
    *,
    head_dim: int,
    group: int,
    causal: bool,
    sm_scale: float,
):
    hd = head_dim
    valid_len = lens_ref[0, 0]
    qkv = qkv_ref[0]  # [T, G*3*hd]
    T = qkv.shape[0]

    k_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    mask = k_pos < valid_len
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        mask = mask & (k_pos <= q_pos)

    for i in range(group):  # unrolled static head loop within the group
        base = i * 3 * hd
        q = qkv[:, base : base + hd] * jnp.asarray(sm_scale, qkv.dtype)
        k = qkv[:, base + hd : base + 2 * hd]
        v = qkv[:, base + 2 * hd : base + 3 * hd]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, T] f32 out of the MXU
        s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        # Zero masked entries explicitly: a fully-masked row has m = -1e30
        # and exp(s - m) = 1 there, not 0 (flash kernel's same guard).
        p = jnp.where(mask, jnp.exp(s - m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Fully-masked query rows (l == 0) emit zeros, like flash.
        o_ref[0, :, i * hd : (i + 1) * hd] = (
            o / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)
        lse_ref[0, i] = m + jnp.log(jnp.maximum(l, 1e-30))


def _core_bwd_kernel(
    lens_ref,  # SMEM [1, 1]
    qkv_ref,  # VMEM [1, T, G*3*hd]
    lse_ref,  # VMEM [1, G, T, 1]
    o_ref,  # VMEM [1, T, G*hd] saved context (for delta = rowsum(dO * O))
    do_ref,  # VMEM [1, T, G*hd]
    dqkv_ref,  # VMEM [1, T, G*3*hd] — [dq | dk | dv], same layout as qkv
    *,
    head_dim: int,
    group: int,
    causal: bool,
    sm_scale: float,
):
    hd = head_dim
    valid_len = lens_ref[0, 0]
    qkv = qkv_ref[0]
    T = qkv.shape[0]
    dt = dqkv_ref.dtype

    k_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    base_mask = k_pos < valid_len
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        base_mask = base_mask & (k_pos <= q_pos)

    for i in range(group):
        base = i * 3 * hd
        # q pre-scaled: S matches the forward, and dS^T @ q_scaled folds
        # the sm_scale dK needs (dq applies its own at the end) —
        # _dqkv_kernel's same discipline, f32 operands throughout.
        q = qkv[:, base : base + hd].astype(jnp.float32) * sm_scale
        k = qkv[:, base + hd : base + 2 * hd].astype(jnp.float32)
        v = qkv[:, base + 2 * hd : base + 3 * hd].astype(jnp.float32)
        do = do_ref[0, :, i * hd : (i + 1) * hd].astype(jnp.float32)
        o = o_ref[0, :, i * hd : (i + 1) * hd].astype(jnp.float32)
        lse = lse_ref[0, i]  # [T, 1] f32

        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Fully-masked rows carry the -1e30 lse sentinel; exp(s - sentinel)
        # would overflow, and they contribute nothing to any gradient.
        mask = base_mask & (lse > -1e29)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # [T, T] f32
        delta = jnp.sum(do * o, axis=-1, keepdims=True)  # [T, 1]
        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq = jax.lax.dot_general(
            ds, k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        dk = jax.lax.dot_general(
            ds, q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(
            p, do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, base : base + hd] = dq.astype(dt)
        dqkv_ref[0, :, base + hd : base + 2 * hd] = dk.astype(dt)
        dqkv_ref[0, :, base + 2 * hd : base + 3 * hd] = dv.astype(dt)


def _core_forward(qkv, key_lens, num_heads, causal, sm_scale, interpret):
    B, T, W = qkv.shape
    hd = W // (3 * num_heads)
    G = _head_group(num_heads, hd)
    lens = key_lens.astype(jnp.int32).reshape(B, 1, 1)
    out, lse = pl.pallas_call(
        functools.partial(
            _core_fwd_kernel, head_dim=hd, group=G, causal=causal,
            sm_scale=sm_scale,
        ),
        grid=(B, num_heads // G),
        in_specs=[
            pl.BlockSpec((None, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, G * 3 * hd), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T, G * hd), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, 1), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, num_heads * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, num_heads, T, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lens, qkv)
    return out, lse


def _core_backward(qkv, key_lens, lse, out, g, num_heads, causal, sm_scale,
                   interpret):
    B, T, W = qkv.shape
    hd = W // (3 * num_heads)
    G = _head_group(num_heads, hd)
    lens = key_lens.astype(jnp.int32).reshape(B, 1, 1)
    dqkv = pl.pallas_call(
        functools.partial(
            _core_bwd_kernel, head_dim=hd, group=G, causal=causal,
            sm_scale=sm_scale,
        ),
        grid=(B, num_heads // G),
        in_specs=[
            pl.BlockSpec((None, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, G * 3 * hd), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, 1), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, G * hd), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, G * hd), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, G * 3 * hd), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, W), qkv.dtype),
        interpret=interpret,
    )(lens, qkv, lse, out, g)
    return dqkv


def _core_xla_backward(qkv, key_lens, lse, out, g, num_heads, causal,
                       sm_scale):
    """The kernel backward's exact math as plain XLA einsums, all f32.

    Same recompute-from-lse formulation as ``_core_bwd_kernel`` — used as
    an overflow-robust alternative: at the wide config a transient
    training spike drives cotangent magnitudes to ~1e19 (forward still
    healthy, BASELINE.md round-5 wide NaN post-mortem), where the Pallas
    backward produces non-finite dqkv while this formulation stays
    finite. Select with ``xla_backward=True`` (config knob
    ``attention_core_xla_backward``); the Pallas backward remains the
    default for the measured full-step speedup.
    """
    B, T, W = qkv.shape
    H = num_heads
    hd = W // (3 * H)
    qkv_h = qkv.reshape(B, T, H, 3, hd).astype(jnp.float32)
    q = qkv_h[:, :, :, 0] * sm_scale  # pre-scaled, kernel's discipline
    k = qkv_h[:, :, :, 1]
    v = qkv_h[:, :, :, 2]
    do = g.reshape(B, T, H, hd).astype(jnp.float32)
    o = out.reshape(B, T, H, hd).astype(jnp.float32)

    s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    pos = jnp.arange(T)
    mask = pos[None, None, None, :] < key_lens[:, None, None, None]
    if causal:
        mask = mask & (pos[None, None, :, None] >= pos[None, None, None, :])
    lse_q = lse[:, :, :, 0][:, :, :, None]  # [B, H, Tq, 1]
    mask = mask & (lse_q > -1e29)  # fully-masked-row sentinel, as in-kernel
    p = jnp.where(mask, jnp.exp(s - lse_q), 0.0)
    delta = jnp.sum(do * o, axis=-1)  # [B, T, H]
    dp = jnp.einsum("bqhd,bkhd->bhqk", do, v)
    ds = p * (dp - delta.transpose(0, 2, 1)[:, :, :, None])
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k) * sm_scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q)  # q pre-scaled folds dK's scale
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, do)
    return jnp.stack([dq, dk, dv], axis=3).reshape(B, T, W).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def attention_core(
    qkv: jax.Array,
    key_lens: jax.Array,
    num_heads: int,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
    xla_backward: bool = False,
) -> jax.Array:
    """Fused resident attention over the interleaved QKV activation.

    qkv: [B, T, num_heads * 3 * head_dim], per-head column groups laid out
    as ``[q_h | k_h | v_h]`` (transformer.py::_qkv_interleaved produces
    this directly from the projection by permuting the fused weight's
    columns). key_lens: [B] valid (prefix) key counts. Returns the
    attention context [B, T, num_heads * head_dim] in the same natural
    layout the output projection consumes.

    Queries/keys beyond ``key_lens[b]`` are masked; fully-masked query
    rows return zeros (flash_attention's same contract).
    """
    if sm_scale is None:
        hd = qkv.shape[-1] // (3 * num_heads)
        sm_scale = 1.0 / math.sqrt(hd)
    out, _ = _core_forward(qkv, key_lens, num_heads, causal, sm_scale,
                           interpret)
    return out


def _core_vjp_fwd(qkv, key_lens, num_heads, causal, sm_scale, interpret,
                  xla_backward=False):
    if sm_scale is None:
        hd = qkv.shape[-1] // (3 * num_heads)
        sm_scale = 1.0 / math.sqrt(hd)
    out, lse = _core_forward(qkv, key_lens, num_heads, causal, sm_scale,
                             interpret)
    return out, (qkv, key_lens, lse, out)


def _core_vjp_bwd(num_heads, causal, sm_scale, interpret, xla_backward,
                  residuals, g):
    qkv, key_lens, lse, out = residuals
    if sm_scale is None:
        hd = qkv.shape[-1] // (3 * num_heads)
        sm_scale = 1.0 / math.sqrt(hd)
    if xla_backward:
        dqkv = _core_xla_backward(qkv, key_lens, lse, out, g, num_heads,
                                  causal, sm_scale)
    else:
        dqkv = _core_backward(qkv, key_lens, lse, out, g, num_heads, causal,
                              sm_scale, interpret)
    return dqkv, None


attention_core.defvjp(_core_vjp_fwd, _core_vjp_bwd)


def attention_core_sharded(
    qkv: jax.Array,
    key_lens: jax.Array,
    num_heads: int,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    mesh=None,
    batch_axis: Optional[str] = None,
    interpret: bool = False,
    xla_backward: bool = False,
) -> jax.Array:
    """Data-parallel composition: the core kernel per batch shard under
    ``shard_map`` (GSPMD cannot partition a pallas_call itself — without
    this wrapper a dp mesh silently REPLICATES the call, measured).
    Decode rows are independent across batch, so each device runs the
    whole kernel on its slice; gradients are per-shard local and the
    custom VJP composes with shard_map unchanged. Requires
    B % mesh.shape[batch_axis] == 0 (checked by the caller's
    eligibility gate, transformer.py::_core_eligible)."""
    from ..parallel.mesh import AXIS_DATA, current_mesh, unchecked_shard_map

    if mesh is None:
        mesh = current_mesh()
    assert mesh is not None, "attention_core_sharded needs a mesh"
    if batch_axis is None:
        batch_axis = AXIS_DATA
    from jax.sharding import PartitionSpec as P

    body = functools.partial(
        attention_core,
        num_heads=num_heads,
        causal=causal,
        sm_scale=sm_scale,
        interpret=interpret,
        xla_backward=xla_backward,
    )
    spec = P(batch_axis, None, None)
    return unchecked_shard_map()(
        lambda qkv, lens: body(qkv, lens),
        mesh=mesh,
        in_specs=(spec, P(batch_axis)),
        out_specs=spec,
    )(qkv, key_lens)


def interleave_qkv_weights(wq, bq, wk, bk, wv, bv, num_heads: int,
                           head_dim: int):
    """Permute separate Q/K/V projection weights into the kernel's
    per-head-interleaved column layout: output column group ``h`` is
    ``[q_h | k_h | v_h]``. The permutation is weight-side (a [D, 3D]
    reshuffle, 4x smaller than the activation, hoisted into the fused
    projection matmul). Shared by BOTH production paths — the mesh-free
    projection (transformer.py::_qkv_interleaved) and the tp shard_map
    body (attention_core_tp, where num_heads is the LOCAL per-shard head
    count) — so the layout cannot drift between them; the tp/mesh-free
    equivalence tests pin it once. Returns (w [D, H*3*hd], b [H*3*hd])."""
    D = wq.shape[0]
    H, hd = num_heads, head_dim
    w = jnp.stack(
        [wq.reshape(D, H, hd), wk.reshape(D, H, hd), wv.reshape(D, H, hd)],
        axis=2,
    ).reshape(D, H * 3 * hd)
    b = jnp.stack(
        [bq.reshape(H, hd), bk.reshape(H, hd), bv.reshape(H, hd)],
        axis=1,
    ).reshape(H * 3 * hd)
    return w, b


def attention_core_tp(
    x: jax.Array,
    wq: jax.Array,
    bq: jax.Array,
    wk: jax.Array,
    bk: jax.Array,
    wv: jax.Array,
    bv: jax.Array,
    key_lens: jax.Array,
    num_heads: int,
    head_dim: int,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    mesh=None,
    interpret: bool = False,
    xla_backward: bool = False,
) -> jax.Array:
    """Tensor-parallel composition: QKV projection + weight-side head
    interleave + the core kernel, all inside ONE ``shard_map`` over the
    (data, model) mesh.

    Under tensor parallelism the Q/K/V kernels are column-sharded
    ``P(None, "model")`` (parallel/mesh.py TP rules). Because the kernel's
    column layout is head-major ([D, H, hd] flattened), an H-aligned
    model-axis slice hands every device COMPLETE heads — so each shard can
    interleave its local weight columns, run its own projection matmul,
    and feed the kernel ``H / tp`` local heads, with zero communication
    beyond the psum GSPMD already inserts for dX of the replicated
    activation (the Megatron block's one collective). Requires
    ``num_heads % tp == 0`` and ``B % dp == 0``
    (transformer.py::_core_eligible gates both).

    x: [B, T, D] activation; wq/wk/wv: [D, num_heads * head_dim] projection
    kernels; bq/bk/bv: [num_heads * head_dim] biases; key_lens: [B].
    Returns the attention context [B, T, num_heads * head_dim], sharded
    (batch over "data", heads over "model") — exactly the row-sharded
    layout the Megatron w_o consumes.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import (
        AXIS_DATA,
        AXIS_MODEL,
        current_mesh,
        unchecked_shard_map,
    )

    if mesh is None:
        mesh = current_mesh()
    assert mesh is not None, "attention_core_tp needs a mesh"
    # Surface the preconditions the caller's eligibility gate is supposed
    # to enforce (transformer.py::_core_eligible): without these, shard_map
    # fails with an opaque GSPMD divisibility message instead of naming
    # the actual contract (each model shard must hold COMPLETE heads, each
    # data shard complete batch rows).
    tp = mesh.shape.get(AXIS_MODEL, 1)
    dp = mesh.shape.get(AXIS_DATA, 1)
    assert num_heads % tp == 0, (
        f"attention_core_tp slices the column-sharded Q/K/V kernels into "
        f"complete heads per model shard: num_heads={num_heads} must be "
        f"divisible by the mesh's model axis ({tp})"
    )
    assert x.shape[0] % dp == 0, (
        f"attention_core_tp shards the batch over the data axis: "
        f"B={x.shape[0]} must be divisible by the mesh's data axis ({dp})"
    )
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    hd = head_dim

    def body(x, wq, bq, wk, bk, wv, bv, lens):
        Hl = wq.shape[1] // hd  # complete local heads on this model shard
        w, b = interleave_qkv_weights(wq, bq, wk, bk, wv, bv, Hl, hd)
        qkv = x @ w + b
        return attention_core(qkv, lens, Hl, causal, sm_scale, interpret,
                              xla_backward)

    col = P(None, AXIS_MODEL)
    row = P(AXIS_MODEL)
    return unchecked_shard_map()(
        body,
        mesh=mesh,
        in_specs=(
            P(AXIS_DATA, None, None),
            col, row, col, row, col, row,
            P(AXIS_DATA),
        ),
        out_specs=P(AXIS_DATA, None, AXIS_MODEL),
    )(x, wq, bq, wk, bk, wv, bv, key_lens)


def reference_core(
    qkv: jax.Array,
    key_lens: jax.Array,
    num_heads: int,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Plain-XLA ground truth over the same interleaved layout."""
    B, T, W = qkv.shape
    hd = W // (3 * num_heads)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    x = qkv.reshape(B, T, num_heads, 3, hd)
    q, k, v = x[:, :, :, 0], x[:, :, :, 1], x[:, :, :, 2]  # [B, T, H, hd]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * sm_scale
    mask = jnp.arange(T)[None, :] < key_lens[:, None]
    bias = jnp.where(mask[:, None, None, :], 0.0, _NEG_INF)
    if causal:
        tri = jnp.tril(jnp.ones((T, T), bool))
        bias = bias + jnp.where(tri[None, None], 0.0, _NEG_INF)
    probs = jax.nn.softmax(logits + bias.astype(logits.dtype), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(B, T, num_heads * hd)
