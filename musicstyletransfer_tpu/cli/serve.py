"""Micro-batched style-transfer service CLI.

One-shot mode: transfer every ``.mid`` in ``--in-dir`` into every style
class, writing ``<name>.class-{c}.mid`` files to ``--out-samples``.
Watch mode (``--watch``): keep polling the directory and serve new files
as they appear (micro-batching via StyleTransferService).

    python -m musicstyletransfer_tpu.cli.serve \
        --model-output models/run1 --in-dir midis/ --out-samples out/
"""

from __future__ import annotations

import argparse
import glob
import os
import time

from ..inference.service import StyleTransferService


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-output", "-m", required=True)
    p.add_argument("--checkpoint", "-c", type=int, default=-1)
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-samples", "-o", required=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-seq-len", type=int, default=64)
    p.add_argument("--watch", action="store_true")
    p.add_argument("--poll-seconds", type=float, default=1.0)
    p.add_argument("--buckets", default="",
                   help="comma-separated length buckets (e.g. '16,32,64'; "
                        "largest must equal --max-seq-len): each batch is "
                        "served at the smallest bucket covering its "
                        "longest request — one compiled program per "
                        "bucket, shorter generation budget for short "
                        "batches")
    p.add_argument("--stats", action="store_true",
                   help="print serving stats (p50/p99 latency, batch "
                        "fill, queue depth) on exit / every watch poll")
    p.add_argument("--cpu", action="store_true",
                   help="pin compute to a local CPU device (tests/dev)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..utils import (
        configure_jax_cache, pin_local_cpu, respect_platforms_env,
    )

    respect_platforms_env()
    configure_jax_cache()
    if args.cpu:
        pin_local_cpu()
    os.makedirs(args.out_samples, exist_ok=True)
    buckets = (
        [int(b) for b in args.buckets.split(",") if b.strip()]
        if args.buckets else None
    )
    svc = StyleTransferService(
        args.model_output,
        checkpoint=args.checkpoint,
        batch_size=args.batch_size,
        max_seq_len=args.max_seq_len,
        buckets=buckets,
    )
    seen = set()

    def process(files):
        batch_tokens, names = [], []
        for f in files:
            with open(f, "rb") as fh:
                data = fh.read()
            try:
                batch_tokens.append(svc._tokens_from_midi(data))
            except ValueError as exc:
                print(f"skipping {f}: {exc}")
                continue
            names.append(os.path.splitext(os.path.basename(f))[0])
            if len(batch_tokens) == svc.batch_size:
                flush(batch_tokens, names)
                batch_tokens, names = [], []
        if batch_tokens:
            flush(batch_tokens, names)

    def flush(batch_tokens, names):
        t0 = time.perf_counter()
        results = svc.transfer_tokens(batch_tokens)
        dt = (time.perf_counter() - t0) * 1e3
        svc.stats.record_batch(
            fill=len(names), queue_depth_after=0,
            latencies_ms=[dt] * len(names),
        )
        for name, result in zip(names, results):
            for c, midi in result.midi_by_class.items():
                out = os.path.join(args.out_samples, f"{name}.class-{c}.mid")
                with open(out, "wb") as fh:
                    fh.write(midi)
        print(f"served {len(names)} files x {svc.num_classes} classes "
              f"in {dt:.1f}ms")

    def print_stats():
        s = svc.stats.snapshot()
        print(
            f"stats: served={s['requests_served']} "
            f"batches={s['batches']} fill={s['mean_batch_fill']:.1f} "
            f"p50={s['latency_p50_ms']:.1f}ms "
            f"p99={s['latency_p99_ms']:.1f}ms "
            f"max_queue={s['max_queue_depth']}"
        )

    while True:
        files = [
            f for f in sorted(glob.glob(os.path.join(args.in_dir, "*.mid")))
            if f not in seen
        ]
        seen.update(files)
        if files:
            process(files)
            if args.stats and args.watch:
                print_stats()
        if not args.watch:
            break
        time.sleep(args.poll_seconds)
    if args.stats and not args.watch:
        print_stats()


if __name__ == "__main__":
    main()
