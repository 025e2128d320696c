"""A/B the fused short-T attention core (ops/attention_core.py) on a TPU.

Protocol per CLAUDE.md tunnel discipline: window-health anchor first,
then INTERLEAVED pairs (XLA arm, core arm, repeat) with per-arm medians —
never sequential single runs. Two measurements:

1. Standalone op fwd+bwd at the wide head shape (B=8, H=16, hd=64,
   T=513): attention_core vs the XLA reference over the SAME interleaved
   layout. (Known caveat: standalone short-T readings sit on the tunnel
   dispatch floor — BASELINE.md round-4 attention argument — so the
   in-model number below is the decision-maker.)
2. In-model: the wide and scaled train configs through bench.py's exact
   steps-per-dispatch protocol (_measure_training_config) with
   attention_core_min_seq_len 0 (XLA attention) vs 256 (core kernel),
   3 interleaved pairs, medians.

Usage: python scripts/core-ab.py [wide|scaled|op|all]   (default all)
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (shared protocol — streaming-bench precedent)


def measure_op(device, T=513, B=8, H=16, hd=64, pairs=3):
    from musicstyletransfer_tpu.ops.attention_core import (
        attention_core, reference_core,
    )

    with jax.default_device(device):
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(
            rng.normal(size=(B, T, H * 3 * hd)).astype(np.float32),
            jnp.bfloat16,
        )
        lens = jnp.asarray([T] * B, jnp.int32)

        def loss_core(qkv):
            return jnp.sum(
                attention_core(qkv, lens, H, True).astype(jnp.float32) ** 2
            )

        def loss_xla(qkv):
            return jnp.sum(
                reference_core(qkv, lens, H, True).astype(jnp.float32) ** 2
            )

        g_core = jax.jit(jax.value_and_grad(loss_core))
        g_xla = jax.jit(jax.value_and_grad(loss_xla))

        # Chain fwd+bwd calls: time by chaining n calls and fetching once.
        def timed(g, n=20):
            v, gr = g(qkv)
            float(v)  # compile + completion barrier
            t0 = time.perf_counter()
            x = qkv
            for _ in range(n):
                v, gr = g(x)
                # data dependence: feed a scaled gradient back in so calls
                # chain on device instead of racing the dispatch loop
                x = x + 0.0 * gr
            float(v)
            return (time.perf_counter() - t0) / n

        core_ts, xla_ts = [], []
        for _ in range(pairs):
            xla_ts.append(timed(g_xla))
            core_ts.append(timed(g_core))
        return {
            "op_T": T,
            "op_xla_ms": round(statistics.median(xla_ts) * 1e3, 3),
            "op_core_ms": round(statistics.median(core_ts) * 1e3, 3),
            "op_core_speedup": round(
                statistics.median(xla_ts) / statistics.median(core_ts), 3
            ),
        }


def measure_model(device, which, pairs=3):
    kw = dict(
        wide=dict(B=8, d_enc=1024, d_dec=512, heads=16, prefix="m"),
        scaled=dict(B=16, d_enc=512, d_dec=256, heads=8, prefix="m"),
    )[which]
    xla_ms, core_ms = [], []
    for _ in range(pairs):
        r0 = bench._measure_training_config(device, core_min=0, **kw)
        r1 = bench._measure_training_config(device, core_min=256, **kw)
        xla_ms.append(r0["m_step_ms"])
        core_ms.append(r1["m_step_ms"])
    med_x = statistics.median(xla_ms)
    med_c = statistics.median(core_ms)
    return {
        "model": which,
        "xla_step_ms": med_x,
        "core_step_ms": med_c,
        "core_speedup": round(med_x / med_c, 3),
        "xla_runs": xla_ms,
        "core_runs": core_ms,
    }


def main():
    from musicstyletransfer_tpu.utils import configure_jax_cache

    configure_jax_cache()
    device = bench._pick_device()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    anchor = bench._measure_anchor(device)
    print(json.dumps({"anchor_xla_t512_ms": anchor}), flush=True)
    if which in ("op", "all"):
        print(json.dumps(measure_op(device)), flush=True)
    if which in ("wide", "all"):
        print(json.dumps(measure_model(device, "wide")), flush=True)
    if which in ("scaled", "all"):
        print(json.dumps(measure_model(device, "scaled")), flush=True)
    anchor_end = bench._measure_anchor(device)
    print(json.dumps({"anchor_xla_t512_ms_end": anchor_end}), flush=True)


if __name__ == "__main__":
    main()
