"""Attribute the tiny-model end-to-end path's fixed per-batch cost
(VERDICT r4 next-#8: 525 audio-s/s e2e vs 16,900 device-program — name the
irreducible term).

Splits one tiny greedy batch into separately timed stages on the real
chip:

  h2d        host→device transfer of the prepared int16 batch, blocked
  device     pipeline executable on an ALREADY-PLACED batch, blocked
             (pure device program: mel → encoder → greedy decode)
  fetch      device→host of tokens+lengths
  detok      host detokenization of all rows
  dispatch   an empty scalar jit round trip (the tunnel RTT floor)

Usage (repo root): python tools/attribute_tiny.py [batch] [max_new] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MAX_NEW = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5


def main():
    import jax
    import jax.numpy as jnp

    from whisper_tpu.config import EngineConfig
    from whisper_tpu.engine import EngineType, create_engine
    from whisper_tpu.tokenizer.detokenize import decode_tokens

    config = EngineConfig(
        model="tiny", language="en", dtype="bfloat16",
        max_new_tokens=MAX_NEW,
    )
    engine = create_engine(EngineType.MONOLITH, config, seed=0)
    rng = np.random.default_rng(1)
    samples = (0.1 * rng.standard_normal((BATCH, 480_000))).astype(np.float32)
    batch, b, n = engine._prepare_batch(samples)
    ac = engine._resolve_audio_ctx(batch)
    program = engine._pipeline_for(ac)

    # warm: compile + first transfers
    placed = engine._place_batch(batch)
    out = jax.block_until_ready(program(engine.assets.params, placed, engine._filters))

    def med(f):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), float(min(ts))

    # host-side batch preparation: float->int16 clip/round + zero-pad
    def do_prepare():
        engine._prepare_batch(samples)

    prep_med, prep_min = med(do_prepare)

    # audio_ctx auto-resolution: np content scan over the prepared batch
    def do_resolve():
        engine._resolve_audio_ctx(batch)

    res_med, res_min = med(do_resolve)

    # h2d: fresh transfer each reps, FORCED by a scalar reduction fetch —
    # block_until_ready on the placed array under-blocks on the tunneled
    # backend (an earlier version of this tool read 1.5 GB/s that way; the
    # real tunnel rate is ~55 MB/s).
    bufs = [batch.copy() for _ in range(REPS)]
    it = iter(bufs)
    checksum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

    def do_h2d():
        float(checksum(engine._place_batch(next(it))))

    h2d_med, h2d_min = med(do_h2d)

    # Device program + result fetch: the tunneled backend's
    # block_until_ready UNDER-BLOCKS (PERF.md probe methodology), so the
    # stage is timed to a SCALAR FETCH of the output — device + one RTT.
    def do_device():
        out2 = program(engine.assets.params, placed, engine._filters)
        np.asarray(out2[1])

    dev_med, dev_min = med(do_device)

    tokens_dev = out[0]

    def do_fetch():
        np.asarray(tokens_dev), np.asarray(out[1])

    fetch_med, fetch_min = med(do_fetch)

    tokens = np.asarray(tokens_dev)
    lengths = np.asarray(out[1])

    def do_detok():
        for i in range(b):
            decode_tokens(engine.vocab, tokens[i][: int(lengths[i])], True)

    detok_med, detok_min = med(do_detok)

    noop = jax.jit(lambda x: x + 1)
    jax.block_until_ready(noop(jnp.float32(0)))

    def do_dispatch():
        jax.block_until_ready(noop(jnp.float32(1)))

    disp_med, disp_min = med(do_dispatch)

    # end-to-end single batch through the public path for the same config
    engine.transcribe_batch(samples)

    def do_e2e():
        engine.transcribe_batch(samples)

    e2e_med, e2e_min = med(do_e2e)

    audio_s = b * 30.0
    mb = batch.nbytes / 1e6
    result = {
        "workload": f"tiny greedy b{BATCH} max_new {MAX_NEW} bf16, int16 audio "
        "transfer, TPU v5e tunnel",
        "batch_mb_int16": round(mb, 1),
        "stages_ms_median": {
            "prepare_batch_host": round(prep_med * 1e3, 1),
            "resolve_audio_ctx_host": round(res_med * 1e3, 1),
            "h2d_transfer": round(h2d_med * 1e3, 1),
            "device_program_plus_rtt": round(dev_med * 1e3, 1),
            "fetch_tokens": round(fetch_med * 1e3, 1),
            "detokenize": round(detok_med * 1e3, 1),
            "dispatch_rtt_floor": round(disp_med * 1e3, 1),
        },
        "stages_ms_min": {
            "prepare_batch_host": round(prep_min * 1e3, 1),
            "resolve_audio_ctx_host": round(res_min * 1e3, 1),
            "h2d_transfer": round(h2d_min * 1e3, 1),
            "device_program_plus_rtt": round(dev_min * 1e3, 1),
            "fetch_tokens": round(fetch_min * 1e3, 1),
            "detokenize": round(detok_min * 1e3, 1),
            "dispatch_rtt_floor": round(disp_min * 1e3, 1),
        },
        "e2e_transcribe_batch_ms": {
            "median": round(e2e_med * 1e3, 1),
            "min": round(e2e_min * 1e3, 1),
        },
        "audio_s_per_s": {
            "device_program_only": round(audio_s / dev_med, 0),
            "e2e_median": round(audio_s / e2e_med, 0),
            "h2d_bound_ceiling": round(audio_s / h2d_med, 0),
        },
        "h2d_effective_MBps": round(mb / h2d_med, 1),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
