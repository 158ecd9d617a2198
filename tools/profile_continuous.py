"""jax.profiler trace of the CONTINUOUS serving path (VERDICT r4 next-#6:
the r4 capture traced only the monolith, leaving the slot pool's residual
cost attribution as an unprofiled hypothesis).

Runs a warmed ContinuousTranscriber over a burst workload under
jax.profiler, then summarizes the xplane with the same machinery as
tools/profile_capture.py.

Usage (repo root): python tools/profile_continuous.py [model] [n] [slots]
Env: PROF_MAX_NEW (32) PROF_LOGDIR (/tmp/whisper_tpu_trace_cont) PROF_TOPK (12)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_capture import summarize_xplane  # noqa: E402

MODEL = sys.argv[1] if len(sys.argv) > 1 else "tiny"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SLOTS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
MAX_NEW = int(os.environ.get("PROF_MAX_NEW", "32"))
LOGDIR = os.environ.get("PROF_LOGDIR", "/tmp/whisper_tpu_trace_cont")
TOPK = int(os.environ.get("PROF_TOPK", "12"))


def main():
    import jax
    import numpy as np

    from whisper_tpu.config import EngineConfig
    from whisper_tpu.engine import EngineType, create_engine
    from whisper_tpu.engine.serving import ContinuousTranscriber

    cfg = EngineConfig(
        model=MODEL, language="en", dtype="bfloat16", max_new_tokens=MAX_NEW
    )
    engine = create_engine(EngineType.ENCDEC, cfg, seed=0)
    rng = np.random.default_rng(0)
    utts = [
        (0.1 * rng.standard_normal(int(rng.integers(16_000, 480_000)))).astype(
            np.float32
        )
        for _ in range(N)
    ]
    with ContinuousTranscriber(engine, n_slots=SLOTS, prefill_batch=4) as t:
        t.warmup()
        t.transcribe(utts[0])  # compile prefill/insert/harvest paths

        jax.profiler.start_trace(LOGDIR)
        t0 = time.perf_counter()
        fs = [t.submit(u) for u in utts]
        lens = [f.result(timeout=600).length for f in fs]
        traced_s = time.perf_counter() - t0
        jax.profiler.stop_trace()
        occ, eff = t.occupancy, t.dispatch_efficiency

    summary = summarize_xplane(LOGDIR, TOPK)
    print(
        json.dumps(
            {
                "config": {
                    "model": MODEL, "n": N, "slots": SLOTS,
                    "max_new": MAX_NEW, "device": str(jax.devices()[0]),
                },
                "traced_run_s": round(traced_s, 3),
                "occupancy": round(occ, 3),
                "dispatch_efficiency": round(eff, 3),
                "decode_len_mean": round(float(np.mean(lens)), 1),
                "logdir": LOGDIR,
                "trace": summary,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
