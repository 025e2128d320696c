"""Streaming engine vs micro-batch service under identical open-loop load.

Measures, on the real chip through the tunnel:

- batch-service capacity (closed-loop full batches) as the load anchor;
- for each engine {batch service, streaming engine}: sustained throughput
  and request p50/p99 under open-loop Poisson-ish arrivals at a fraction
  of that capacity, with the SAME mixed-length request population the
  service bench uses.

Usage:
    python scripts/streaming-bench.py [load_frac] [slots] [segment_steps] \
        [admit_size]
Defaults: 0.5 32 16 8. Prints one JSON line per engine plus a summary.

Tunnel discipline (CLAUDE.md): the two engines run interleaved per load
level within one process/window; compare the printed pair, not numbers
from different runs.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _pick_device():
    import jax

    for kind in ("tpu", "axon"):
        try:
            devs = jax.devices(kind)
            if devs:
                return devs[0]
        except RuntimeError:
            continue
    return jax.devices()[0]


def make_model_folder() -> str:
    import jax

    from __graft_entry__ import _flagship_config
    from musicstyletransfer_tpu.models import init_params, make_model
    from musicstyletransfer_tpu.training import (
        OptimizerConfig, build_optimizer, create_train_state, save_checkpoint,
    )

    folder = tempfile.mkdtemp(prefix="mst-stream-bench-")
    cfg = _flagship_config(dtype="bfloat16")
    cfg.save(os.path.join(folder, "config"))
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0), max_seq_len=64)
    tx = build_optimizer(OptimizerConfig("adam", "", 1e-3))
    save_checkpoint(folder, 1,
                    create_train_state(params, tx, jax.random.key(0)))
    return folder


def request_population():
    from musicstyletransfer_tpu.midi import smf
    from musicstyletransfer_tpu.midi.codec import Melody, MelodyWriter
    from musicstyletransfer_tpu.midi.vocab import note_on_id, timeshift_id

    writer = MelodyWriter()
    rng = np.random.default_rng(0)

    def midi_of_len(n_events):
        toks = []
        for _ in range(n_events // 2):
            p = int(rng.integers(40, 80))
            toks += [note_on_id(p), timeshift_id(90)]
        return smf.dump_midifile(
            writer.to_midifile(Melody(tokens=np.asarray(toks, np.int32)))
        )

    # Same mix as bench.py's sustained-service measurement.
    return ([midi_of_len(12) for _ in range(6)]
            + [midi_of_len(28) for _ in range(3)]
            + [midi_of_len(60) for _ in range(1)])


def run_load(svc, requests, rate, n_target, label):
    """Open-loop arrivals at ``rate`` req/s; returns stats dict."""
    n_target -= n_target % 4
    svc.stats = type(svc.stats)()
    done = threading.Event()
    served = []

    def on_result(r):
        served.append(r)
        if len(served) >= n_target:
            done.set()

    svc.start()
    t0 = time.perf_counter()
    try:
        n_prod = 4
        per_thread_interval = n_prod / rate

        def producer(tid):
            r = np.random.default_rng(tid)
            nxt = time.perf_counter() + per_thread_interval * (tid / n_prod)
            for _ in range(n_target // n_prod):
                delay = nxt - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
                svc.enqueue(requests[int(r.integers(0, len(requests)))],
                            on_result)
                nxt += per_thread_interval
        threads = [threading.Thread(target=producer, args=(t,))
                   for t in range(n_prod)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        done.wait(timeout=240)
    finally:
        svc.stop()
    wall = time.perf_counter() - t0
    errors = sum(1 for r in served if isinstance(r, Exception))
    s = svc.stats.snapshot()
    out = {
        "engine": label,
        "offered_req_per_sec": round(rate, 1),
        "sustained_req_per_sec": round(s["requests_served"] / wall, 1),
        "p50_ms": round(s["latency_p50_ms"], 1),
        "p99_ms": round(s["latency_p99_ms"], 1),
        "mean_fill": round(s["mean_batch_fill"], 1),
        "max_queue_depth": s["max_queue_depth"],
        "errors": errors,
        "completed": len(served),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax

    from musicstyletransfer_tpu.utils import configure_jax_cache

    configure_jax_cache()
    load_frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    segment_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    admit_size = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    device = _pick_device()
    print(f"# device: {device}, load_frac={load_frac}, slots={slots}, "
          f"segment_steps={segment_steps}", flush=True)

    with jax.default_device(device):
        folder = make_model_folder()
        requests = request_population()

        from musicstyletransfer_tpu.inference.service import (
            StyleTransferService,
        )
        from musicstyletransfer_tpu.inference.streaming import (
            StreamingTransferEngine,
        )

        svc = StyleTransferService(folder, checkpoint=-1, batch_size=32,
                                   max_seq_len=64, max_wait_ms=5.0,
                                   buckets=[16, 32, 64])
        eng = StreamingTransferEngine(folder, checkpoint=-1, slots=slots,
                                      max_seq_len=64,
                                      segment_steps=segment_steps,
                                      admit_size=admit_size)

        # Warm every compiled program outside the timed windows.
        for m in (requests[0], requests[6], requests[9]):
            svc.submit_midi(m)
            eng.submit_midi(m)

        # Capacity anchor: one full max-bucket batch through the service.
        toks = [svc._tokens_from_midi(requests[9])] * 32
        svc.transfer_tokens(toks)  # warm the full-batch shape
        t0 = time.perf_counter()
        svc.transfer_tokens(toks)
        cap = 32 / (time.perf_counter() - t0)
        print(json.dumps({"service_capacity_req_per_sec": round(cap, 1)}),
              flush=True)

        rate = load_frac * cap
        n_target = min(600, max(100, int(rate * 10)))
        # Interleave: service then streaming in the same window.
        s_batch = run_load(svc, requests, rate, n_target, "batch")
        s_stream = run_load(eng, requests, rate, n_target, "streaming")
        print(json.dumps({
            "p50_speedup_streaming": round(
                s_batch["p50_ms"] / max(s_stream["p50_ms"], 1e-9), 2),
            "p99_speedup_streaming": round(
                s_batch["p99_ms"] / max(s_stream["p99_ms"], 1e-9), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
