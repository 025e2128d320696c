"""Profile the scaled train step and print a per-op time breakdown.

Runs the best measured config (B=16, remat off — scripts/mfu-sweep.py) for
a few steps under ``jax.profiler.trace`` and aggregates device-side op
durations from the trace protobuf-JSON (no TensorBoard needed: gunzip the
.trace.json.gz and sum ``ph == "X"`` events by name — the technique that
found the r02 top-5-metric sort hotspot).

Usage: python scripts/profile-step.py [B] [remat(0/1)]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    remat = (sys.argv[2] not in ("0", "false")) if len(sys.argv) > 2 else False

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from musicstyletransfer_tpu.utils import configure_jax_cache

    configure_jax_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    sweep = importlib.import_module("mfu-sweep")
    device = sweep._pick_device()

    from musicstyletransfer_tpu.models import init_params, make_model
    from musicstyletransfer_tpu.training import (
        LossConfig, create_train_state, make_train_step,
    )

    cfg = sweep.scaled_config(remat)
    L = 512
    with jax.default_device(device):
        model = make_model(cfg)
        params = init_params(model, jax.random.key(0), max_seq_len=L)
        tx = optax.chain(optax.clip(1.0), optax.adam(2e-4))
        state = create_train_state(params, tx, jax.random.key(1, impl="rbg"))
        step = make_train_step(model, tx, LossConfig(kl_weight=0.5))
        rng = np.random.default_rng(0)
        chunks = jnp.asarray(rng.integers(3, 293, (B, L)).astype(np.int32))
        classes = jnp.asarray(rng.integers(0, 2, (B,)).astype(np.int32))
        state, acc = step(state, None, chunks, classes)
        state, acc = step(state, acc, chunks, classes)
        float(acc["total_loss"][0])

        trace_dir = tempfile.mkdtemp(prefix="mst-prof-")
        n = 10
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                state, acc = step(state, acc, chunks, classes)
            float(acc["total_loss"][0])

    traces = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not traces:
        raise SystemExit(f"no trace written under {trace_dir}")
    with gzip.open(traces[0], "rt") as fh:
        data = json.load(fh)

    # Device lanes: pick pids whose process name mentions the accelerator
    # (falls back to every non-python pid).
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if any(s in name.lower() for s in ("tpu", "device", "xla", "/device"))
    } or set(pid_names)

    by_name = collections.Counter()
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            dur = float(ev.get("dur", 0.0))
            by_name[ev.get("name", "?")] += dur
            total += dur
    print(f"# pids: { {p: pid_names.get(p, '?') for p in device_pids} }")
    print(f"# total device op time: {total / 1e3:.2f} ms over {n} steps "
          f"({total / 1e3 / n:.2f} ms/step)")
    for name, dur in by_name.most_common(20):
        print(json.dumps({
            "op": name[:100],
            "ms_per_step": round(dur / 1e3 / n, 3),
            "pct": round(100 * dur / total, 1),
        }))


if __name__ == "__main__":
    main()
