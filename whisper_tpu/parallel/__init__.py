from whisper_tpu.parallel.mesh import make_mesh, local_mesh_shape
from whisper_tpu.parallel.multihost import (
    global_batch,
    host_shard,
    initialize,
    load_files_sharded,
)
from whisper_tpu.parallel.sharding import (
    param_pspecs,
    shard_params,
    input_pspec,
    enc_out_pspec,
)

__all__ = [
    "make_mesh",
    "local_mesh_shape",
    "param_pspecs",
    "shard_params",
    "input_pspec",
    "enc_out_pspec",
    "initialize",
    "host_shard",
    "global_batch",
    "load_files_sharded",
]
