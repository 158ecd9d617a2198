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
    ap.add_argument("--eot-bias", type=float, default=None,
                    help="additive EOT logit bias (config.logit_bias): "
                    "random-weight decodes then stop geometrically, giving "
                    "REAL decode-length variance — the regime the slot "
                    "pool's design targets (VERDICT r4 next-#6)")
    ap.add_argument("--platform", default=None,
                    help="pin the jax platform (e.g. cpu: RTT≈0 control "
                    "run — the sitecustomize registers the tunneled TPU "
                    "backend, so JAX_PLATFORMS alone is a no-op)")
    ap.add_argument("--arrival-ms", type=float, default=0.0,
                    help="gap between submits (steady-state serving instead "
                    "of a burst; per-request latency is reported either way)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

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
        # Pin the full audio window: this tool compares SCHEDULING, and
        # the slot pool always decodes full-window (fixed slot geometry)
        # while the async path would auto-crop short utterances — with
        # random weights the crop changes EOT behavior and the rows stop
        # being the same workload (observed: async decode_len_mean 45.6
        # vs 91.5 under audio_ctx="auto").
        audio_ctx=None,
    )
    if args.eot_bias is not None:
        from whisper_tpu.tokenizer.vocab import Vocab, num_languages_for

        dims = config.dims()
        v = Vocab.synthetic(
            multilingual=config.multilingual,
            num_languages=num_languages_for(dims.n_vocab),
        )
        config = __import__("dataclasses").replace(
            config, logit_bias=((v.specials.eot, args.eot_bias),)
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
        # Warm and time the SAME instance: the serving-layer jits live in
        # per-instance closures, so a fresh instance would recompile inside
        # the timed region (cProfile r5: ~2 s of a 9.6 s CPU continuous run).
        t2 = make()
        with t2:
            getattr(t2, "warmup", lambda: None)()  # all bucket programs
            t2.transcribe(utts[0])  # warmup: compile everything else
            t0 = time.perf_counter()
            futures, submit_ts, done_ts, lens = [], [], [], []
            for u in utts:
                if args.arrival_ms and futures:
                    time.sleep(args.arrival_ms / 1e3)
                submit_ts.append(time.perf_counter())
                futures.append(t2.submit(u))
            for f, ts in zip(futures, submit_ts):
                lens.append(f.result(timeout=600).length)
                done_ts.append(time.perf_counter())
            dt = time.perf_counter() - t0
        # Completion order == submit order here, so per-request latency is
        # bounded above by (done - submit); fine for comparing front-ends.
        lats = [d - s for s, d in zip(submit_ts, done_ts)]
        extra = {}
        if hasattr(t2, "dispatch_efficiency"):
            extra = {
                "occupancy": round(t2.occupancy, 3),
                "dispatch_efficiency": round(t2.dispatch_efficiency, 3),
            }
        print(json.dumps({
            "frontend": name,
            **extra,
            "utterances": args.n,
            "wall_s": round(dt, 3),
            "utterances_per_s": round(args.n / dt, 2),
            "audio_s_per_s": round(audio_s / dt, 1),
            "latency_mean_s": round(float(np.mean(lats)), 3),
            "latency_max_s": round(float(np.max(lats)), 3),
            "decode_len_mean": round(float(np.mean(lens)), 1),
            "decode_len_std": round(float(np.std(lens)), 1),
            "decode_len_minmax": [int(min(lens)), int(max(lens))],
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
