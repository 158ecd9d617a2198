"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: audio-seconds of input transcribed per wall-clock second on one chip
(BASELINE.json primary metric). The run is the monolith pipeline — pad →
log-mel → encoder → KV-cached greedy decode — on random weights (throughput
is weight-value independent) with a fixed decode budget per 30 s chunk.

vs_baseline is reported against the BASELINE.json north-star of 2,000
audio-seconds/s per v5p *host* (4 chips) for large-v3, i.e. 500 audio-s/s per
chip — the only number the baseline defines (the reference itself publishes
none, BASELINE.md).

Env knobs: BENCH_MODEL (default tiny), BENCH_BATCH (default 8),
BENCH_MAX_NEW (default 32), BENCH_REPEATS (default 3).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.decode.greedy import greedy_decode
from whisper_tpu.frontend.filters import mel_filterbank
from whisper_tpu.frontend.mel import log_mel_spectrogram
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params

MODEL = os.environ.get("BENCH_MODEL", "tiny")
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
MAX_NEW = int(os.environ.get("BENCH_MAX_NEW", "32"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
QUANT = os.environ.get("BENCH_QUANT", "")  # "" | "int8"
BEAM = int(os.environ.get("BENCH_BEAM", "1"))
KV_DTYPE = os.environ.get("BENCH_KV", "")  # "" | "float8_e4m3fn"
NORTH_STAR_PER_CHIP = 500.0  # 2000 audio-s/s per 4-chip v5p host, large-v3


def main():
    dims = MODEL_DIMS[MODEL]
    params = init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if QUANT == "int8":
        from whisper_tpu.models.quantize import quantize_params

        params = quantize_params(params)
    filters = jnp.asarray(mel_filterbank(n_mels=dims.n_mels))
    samples = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 480_000)) * 0.1
    sot = 50258 if dims.multilingual else 50257
    not_ts = 50363 if dims.multilingual else 50362
    eot = 50257 if dims.multilingual else 50256
    prompt = jnp.tile(jnp.array([[sot, not_ts]], jnp.int32), (BATCH, 1))

    @jax.jit
    def pipeline(params, samples, filters, prompt):
        mel = log_mel_spectrogram(samples, filters, n_mels=dims.n_mels)
        enc_out = encode(params, mel.astype(jnp.bfloat16), dims)
        kv_dtype = jnp.dtype(KV_DTYPE) if KV_DTYPE else None
        if BEAM > 1:
            from whisper_tpu.decode.beam import beam_decode

            tokens, lengths, _ = beam_decode(
                params, enc_out, prompt, dims, eot=eot, max_new_tokens=MAX_NEW,
                beam_size=BEAM, compute_dtype=jnp.bfloat16,
                kv_cache_dtype=kv_dtype,
            )
            return tokens, lengths
        return greedy_decode(
            params, enc_out, prompt, dims, eot=eot,
            max_new_tokens=MAX_NEW, compute_dtype=jnp.bfloat16,
            kv_cache_dtype=kv_dtype,
        )

    # Warmup / compile. Random weights rarely emit EOT, so every decode runs
    # the full MAX_NEW budget — worst-case (most honest) token count.
    tokens, _ = pipeline(params, samples, filters, prompt)
    jax.block_until_ready(tokens)

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        tokens, lengths = pipeline(params, samples, filters, prompt)
        np.asarray(tokens)  # host transfer: guarantees device completion even
        # where an RPC-tunneled backend under-blocks block_until_ready
        times.append(time.perf_counter() - t0)

    best = min(times)
    audio_seconds = BATCH * 30.0
    value = audio_seconds / best
    print(
        json.dumps(
            {
                "metric": "audio-seconds/s per chip",
                "value": round(value, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(value / NORTH_STAR_PER_CHIP, 3),
                "config": {
                    "model": MODEL,
                    "batch": BATCH,
                    "max_new_tokens": MAX_NEW,
                    "beam": BEAM,
                    "quant": QUANT or None,
                    "kv_dtype": KV_DTYPE or None,
                    "dtype": "bfloat16",
                    "device": str(jax.devices()[0]),
                    "times_s": [round(t, 4) for t in times],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
