"""Worker process for the multi-process leg of the multichip dryrun
(parallel/dryrun.py) — the same protocol as tests/_dist_worker.py but
shipped inside the package so the dryrun is self-contained.

Each process owns ``--local-devices`` virtual CPU devices, joins the
coordinator, stands up the engine on a global (N, 1) mesh through the
public ``create_engine`` surface, and runs ``transcribe_files`` over the
shared path list (each host decodes only its shard — parallel/multihost.py);
the full allgathered result list is written to ``--out`` as JSON.

Run only as a subprocess:
    python -m whisper_tpu.parallel._dist_worker --coordinator host:port \
        --num-processes N --process-id I --paths f1,f2,… --out result.json
"""

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--paths", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="dev")
    ap.add_argument("--max-new", type=int, default=4)
    ap.add_argument(
        "--fallback", action="store_true",
        help="enable an always-failing quality gate + retry ladder so the "
        "multi-process temperature-fallback path is exercised",
    )
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from whisper_tpu.parallel.multihost import initialize

    initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = len(jax.devices())

    from whisper_tpu.config import EngineConfig
    from whisper_tpu.engine import EngineType, create_engine

    extra = {}
    if args.fallback:
        # logprob gate no decode can clear → every row walks the full retry
        # ladder through the SPMD fallback path (engine._mp_pass subsets).
        extra = dict(
            fallback_temperatures=(0.5,),
            logprob_threshold=1e9,
            compression_ratio_threshold=None,
        )
    engine = create_engine(
        EngineType.MONOLITH,
        EngineConfig(
            model=args.model, language="en", max_new_tokens=args.max_new,
            dtype="float32", mesh_shape=(n_global, 1), **extra,
        ),
        seed=0,
    )
    paths = args.paths.split(",")
    results = engine.transcribe_files(paths)
    # Uneven-shard probe: a 1-item pass leaves every host but the first with
    # ZERO local files — the uniform-padding layout must still form an even
    # global array and return the same tokens as the full-list first pass.
    probe_rows, _, _ = engine._mp_pass(paths[:1])
    with open(args.out, "w") as f:
        json.dump(
            {
                "process_index": jax.process_index(),
                "n_devices": n_global,
                "results": [
                    {
                        "tokens": [int(t) for t in r.tokens[: r.length]],
                        "text": r.text,
                        "temperature": r.temperature,
                    }
                    for r in results
                ],
                "probe_single": [
                    int(t) for t in probe_rows[0][0][: probe_rows[0][1]]
                ],
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
