"""Serving-layer throughput comparison on a mixed-length workload.

Measures utterances/s and audio-seconds/s through the three serving
front-ends over the same arrival sequence:

* AsyncTranscriber       — lock-step padded batches (a batch is as slow as
                           its slowest decode)
* ContinuousTranscriber  — slot pool, but prefill blocks the decode loop
* DisaggregatedTranscriber — prefill on its own thread (and optionally its
                           own chip) feeding the slot pool

The workload mixes short and long decodes (mixed EOT behavior comes from
random weights rarely emitting EOT — every decode runs the full budget — so
the mix here is in arrival pattern and prefill pressure; on real weights the
slot pool's advantage grows with decode-length variance).

Usage:  python tools/bench_serving.py [--model dev] [--n 32] [--slots 8]
        [--prefill-batch 4] [--max-new 32] [--dtype float32]
        [--encode-device-index N]
Prints one JSON line per front-end.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dev")
    ap.add_argument("--n", type=int, default=32, help="number of utterances")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--prefill-batch", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--language", default="en")
    ap.add_argument(
        "--encode-device-index", type=int, default=None,
        help="run disaggregated prefill on this jax device (default: same)",
    )
    ap.add_argument("--skip-async", action="store_true")
    ap.add_argument("--skip-disagg", action="store_true")
    ap.add_argument("--sync-every", type=int, default=None,
                    help="decode steps per slot-pool dispatch (default: "
                    "serving.py's)")
    args = ap.parse_args()

    import jax

    from whisper_tpu.config import EngineConfig
    from whisper_tpu.engine import EngineType, create_engine
    from whisper_tpu.engine.serving import (
        AsyncTranscriber,
        ContinuousTranscriber,
        DisaggregatedTranscriber,
    )

    config = EngineConfig(
        model=args.model, language=args.language, dtype=args.dtype,
        max_new_tokens=args.max_new,
    )
    engine = create_engine(EngineType.ENCDEC, config, seed=0)

    rng = np.random.default_rng(0)
    utts = [
        (0.1 * rng.standard_normal(int(rng.integers(16_000, 480_000)))).astype(
            np.float32
        )
        for _ in range(args.n)
    ]
    audio_s = sum(len(u) for u in utts) / 16_000.0

    def run(name, make):
        t = make()
        with t:
            t.transcribe(utts[0])  # warmup: compile everything
        t2 = make()
        with t2:
            t0 = time.perf_counter()
            futures = [t2.submit(u) for u in utts]
            for f in futures:
                f.result(timeout=600)
            dt = time.perf_counter() - t0
        print(json.dumps({
            "frontend": name,
            "utterances": args.n,
            "wall_s": round(dt, 3),
            "utterances_per_s": round(args.n / dt, 2),
            "audio_s_per_s": round(audio_s / dt, 1),
        }))
        return dt

    enc_dev = (
        jax.devices()[args.encode_device_index]
        if args.encode_device_index is not None
        else None
    )
    if not args.skip_async:
        run("async", lambda: AsyncTranscriber(engine, max_batch=args.slots))
    kw = {}
    if args.sync_every is not None:
        kw["sync_every"] = args.sync_every
    base = run("continuous", lambda: ContinuousTranscriber(
        engine, n_slots=args.slots, prefill_batch=args.prefill_batch, **kw))
    if not args.skip_disagg:
        disagg = run("disaggregated", lambda: DisaggregatedTranscriber(
            engine, n_slots=args.slots, prefill_batch=args.prefill_batch,
            encode_device=enc_dev, **kw))
        print(json.dumps({
            "speedup_disagg_vs_continuous": round(base / disagg, 3)
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
