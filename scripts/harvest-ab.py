"""Same-window A/B isolating the round-5 streaming changes.

Four arms interleaved per load level in ONE process/window (tunnel
discipline — cross-window absolutes are meaningless):

- batch service (window anchor arm);
- adapt: auto harvest delay (AIMD controller) + full-width admission —
  the new defaults;
- fixed: harvest delay PINNED to the adaptive arm's startup-calibrated
  value + full-width admission — isolates the controller;
- old: pinned delay + admit_size=16 — the pre-round-5 shipped config,
  isolates admission width at this load.

Usage: python scripts/harvest-ab.py [load_fracs_csv] [slots]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from musicstyletransfer_tpu.utils import configure_jax_cache

    configure_jax_cache()
    load_fracs = ([float(f) for f in sys.argv[1].split(",")]
                  if len(sys.argv) > 1 else [0.5, 0.9])
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "streaming_bench", "/root/repo/scripts/streaming-bench.py")
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)

    from bench import _flagship_model_folder, _mixed_requests

    device = sb._pick_device()
    with jax.default_device(device):
        folder = _flagship_model_folder(prefix="mst-harvest-ab-")
        requests = _mixed_requests()

        from musicstyletransfer_tpu.inference.service import (
            StyleTransferService,
        )
        from musicstyletransfer_tpu.inference.streaming import (
            StreamingTransferEngine,
        )

        svc = StyleTransferService(folder, checkpoint=-1, batch_size=32,
                                   max_seq_len=64, max_wait_ms=5.0,
                                   buckets=[16, 32, 64])
        adapt = StreamingTransferEngine(folder, checkpoint=-1, slots=slots,
                                        max_seq_len=64, segment_steps=32)
        # Warm the adaptive arm first so its calibrated delay seeds the
        # pinned arms (the pre-controller auto behavior = that value,
        # fixed forever).
        for m in (requests[0], requests[6], requests[9]):
            svc.submit_midi(m)
            adapt.submit_midi(m)
        d0 = adapt._delay_ctl.delay if adapt._delay_ctl else 0.0
        print(json.dumps({"calibrated_delay_ms": round(d0 * 1e3, 2)}),
              flush=True)
        fixed = StreamingTransferEngine(folder, checkpoint=-1, slots=slots,
                                        max_seq_len=64, segment_steps=32,
                                        harvest_delay_s=d0)
        old = StreamingTransferEngine(folder, checkpoint=-1, slots=slots,
                                      max_seq_len=64, segment_steps=32,
                                      admit_size=16, harvest_delay_s=d0)
        for m in (requests[0], requests[6], requests[9]):
            fixed.submit_midi(m)
            old.submit_midi(m)

        import time

        import numpy as np

        toks = [svc._tokens_from_midi(requests[9])] * 32
        svc.transfer_tokens(toks)
        caps = []
        for _ in range(3):
            t0 = time.perf_counter()
            svc.transfer_tokens(toks)
            caps.append(32 / (time.perf_counter() - t0))
        cap = float(np.median(caps))
        print(json.dumps({"service_capacity_req_per_sec": round(cap, 1)}),
              flush=True)

        for load in load_fracs:
            rate = load * cap
            n_target = min(600, max(100, int(rate * 10)))
            sb.run_load(svc, requests, rate, n_target, f"batch@{load}")
            sb.run_load(adapt, requests, rate, n_target, f"adapt@{load}")
            print(json.dumps({"adapt_delay_after_ms": round(
                adapt._harvest_delay * 1e3, 2)}), flush=True)
            sb.run_load(fixed, requests, rate, n_target, f"fixed@{load}")
            sb.run_load(old, requests, rate, n_target, f"old@{load}")


if __name__ == "__main__":
    main()
