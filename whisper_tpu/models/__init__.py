from whisper_tpu.models.params import init_params, sinusoid_position_embedding
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.decoder import (
    init_kv_cache,
    precompute_cross_kv,
    decoder_prefill,
    decoder_step,
)

__all__ = [
    "init_params",
    "sinusoid_position_embedding",
    "encode",
    "init_kv_cache",
    "precompute_cross_kv",
    "decoder_prefill",
    "decoder_step",
]
