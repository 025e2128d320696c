"""Measured evidence for the re-rotating ring-attention backward (VERDICT
r03 item 6): the old backward (reverse-mode through the scan) saves every
rotated K/V chunk — one full K/V copy per device — while the round-4
custom-VJP backward re-rotates and keeps O(T/n).

Modes:

  python scripts/ring-memory.py mem [T ...]
      8-device CPU mesh (1 data x 8 model), B=1 H=4 D=64 f32, causal.
      For each T: XLA's compiled memory analysis (temp allocation bytes)
      of value_and_grad through (a) the OLD formulation — jax.grad
      straight through _ring_forward's scan — and (b) the shipped
      custom-VJP ring. Prints one JSON line per T. The old path's temp
      grows with the FULL T (the saved rotation chunks); the new path's
      with T/n.

  python scripts/ring-memory.py time [T]
      Real-chip overhead probe: ring_attention_sharded on a 1-device
      (data=1, model=1) mesh vs plain flash_attention, fwd+bwd at T
      (default 8192), chained-iteration timing per CLAUDE.md. n=1 is the
      only ring size one chip can run; it prices the shard_map wrapper +
      custom-VJP boundary, the per-device constant cost every ring step
      also pays.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1] if len(sys.argv) > 1 else "mem"

if MODE == "mem":
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        + os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
    )

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _pick_device():
    for kind in ("tpu", "axon"):
        try:
            devs = jax.devices(kind)
            if devs:
                return devs[0]
        except RuntimeError:
            continue
    return jax.devices()[0]


def mem_mode(lengths):
    jax.config.update("jax_platforms", "cpu")
    import functools

    from jax.sharding import PartitionSpec as P

    from musicstyletransfer_tpu.ops import ring_attention as ra
    from musicstyletransfer_tpu.parallel.mesh import (
        AXIS_DATA, AXIS_MODEL, make_mesh,
    )

    mesh = make_mesh(jax.devices("cpu")[:8], tp=8)
    n = mesh.shape[AXIS_MODEL]
    B, H, D = 1, 4, 64
    spec = P(AXIS_DATA, None, AXIS_MODEL, None)
    shard_map = ra._shard_map

    def build(loss_of_body, T):
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
            for _ in range(3)
        )
        lens = jnp.full((B,), T, jnp.int32)

        body = shard_map(
            loss_of_body,
            mesh=mesh,
            in_specs=(spec, spec, spec, P(AXIS_DATA)),
            out_specs=(spec, spec, spec),
        )

        def grads(q, k, v, lens):
            return body(q, k, v, lens)

        return jax.jit(grads).lower(q, k, v, lens).compile()

    def old_body(q, k, v, lens):
        # The r03 formulation: reverse mode THROUGH the forward scan —
        # saves each rotated K/V chunk (n * T/n = full K/V per device).
        def loss(q, k, v):
            out, _ = ra._ring_forward(
                q, k, v, lens, True, AXIS_MODEL, n, D ** -0.5, True
            )
            return jnp.sum(out)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def new_body(q, k, v, lens):
        # The shipped custom-VJP ring (re-rotating backward, O(T/n)).
        def loss(q, k, v):
            return jnp.sum(ra.ring_flash_attention(
                q, k, v, lens, causal=True, axis_name=AXIS_MODEL,
                axis_size=n, interpret=True,
            ).astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    for T in lengths:
        row = {"T": T, "ring": n}
        for name, body in (("old", old_body), ("new", new_body)):
            try:
                compiled = build(body, T)
                ma = compiled.memory_analysis()
                row[f"{name}_temp_mb"] = round(
                    ma.temp_size_in_bytes / 1e6, 1)
                row[f"{name}_total_mb"] = round(
                    (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                     + ma.output_size_in_bytes) / 1e6, 1)
            except Exception as e:
                row[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:120]}"
        if "old_temp_mb" in row and "new_temp_mb" in row:
            row["temp_ratio_old_over_new"] = round(
                row["old_temp_mb"] / max(row["new_temp_mb"], 1e-9), 2)
        print(json.dumps(row), flush=True)


def time_mode(T):
    from musicstyletransfer_tpu.utils import configure_jax_cache

    configure_jax_cache()
    device = _pick_device()
    from musicstyletransfer_tpu.ops.flash_attention import flash_attention
    from musicstyletransfer_tpu.ops.ring_attention import (
        ring_attention_sharded,
    )
    from musicstyletransfer_tpu.parallel.mesh import make_mesh

    B, H, D = 1, 4, 64
    mesh = make_mesh([device], tp=1)
    with jax.default_device(device):
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32),
                        jnp.bfloat16)
            for _ in range(3)
        )
        lens = jnp.full((B,), T, jnp.int32)

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention_sharded(
                q, k, v, lens, causal=True, mesh=mesh, interpret=False,
            ).astype(jnp.float32))

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, lens, causal=True)
                           .astype(jnp.float32))

        def timeit(f, reps=8):
            grad_f = jax.grad(f, argnums=(0, 1, 2))

            @jax.jit
            def run(q, k, v, total):
                dq, dk, dv = grad_f(q, k, v)
                return total + (jnp.sum(dq.astype(jnp.float32))
                                + jnp.sum(dk.astype(jnp.float32))
                                + jnp.sum(dv.astype(jnp.float32)))

            float(run(q, k, v, jnp.zeros(())))  # warmup + real barrier
            t0 = time.perf_counter()
            total = jnp.zeros(())
            for _ in range(reps):
                total = run(q, k, v, total)  # chained
            float(total)  # host fetch = completion barrier
            return (time.perf_counter() - t0) / reps

        # Interleaved pairs + medians (CLAUDE.md tunnel discipline).
        rs, fs = [], []
        for _ in range(3):
            rs.append(timeit(loss_ring))
            fs.append(timeit(loss_flash))
        r, f = float(np.median(rs)), float(np.median(fs))
    print(json.dumps({
        "T": T,
        "ring1_fwd_bwd_ms": round(r * 1e3, 3),
        "flash_fwd_bwd_ms": round(f * 1e3, 3),
        "ring1_overhead": round(r / f, 3),
    }), flush=True)


if __name__ == "__main__":
    if MODE == "mem":
        lengths = [int(t) for t in sys.argv[2:]] or [8192, 16384, 32768]
        mem_mode(lengths)
    elif MODE == "time":
        time_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 8192)
    else:
        raise SystemExit(f"unknown mode {MODE}")
