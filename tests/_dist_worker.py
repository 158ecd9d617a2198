"""Worker process for the two-process jax.distributed tests — thin shim over
the package-shipped worker (whisper_tpu/parallel/_dist_worker.py), kept so
existing invocations of this path keep working."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_tpu.parallel._dist_worker import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
