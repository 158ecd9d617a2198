"""Worker process for the two-process jax.distributed test
(tests/test_multiprocess.py). Each process owns 4 virtual CPU devices
(XLA_FLAGS set by the parent), joins the coordinator, stands up the engine
on an (8, 1) global mesh, and transcribes its file shard into a globally
sharded batch; the allgathered results are written to --out.

Run only as a subprocess — argv: --coordinator host:port --num-processes N
--process-id I --paths f1,f2,… --out result.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--paths", required=True)
    ap.add_argument("--out", required=True)
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

    engine = create_engine(
        EngineType.MONOLITH,
        EngineConfig(
            model="dev", language="en", max_new_tokens=4, dtype="float32",
            mesh_shape=(n_global, 1),
        ),
        seed=0,
    )
    paths = args.paths.split(",")
    results = engine.transcribe_files(paths)
    with open(args.out, "w") as f:
        json.dump(
            {
                "process_index": jax.process_index(),
                "n_devices": n_global,
                "results": [
                    {
                        "tokens": [int(t) for t in r.tokens[: r.length]],
                        "text": r.text,
                    }
                    for r in results
                ],
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
