from whisper_tpu.decode.greedy import greedy_decode, argmax_last
from whisper_tpu.decode.prompt import build_prompt
from whisper_tpu.decode.fallback import (
    compression_ratio,
    needs_fallback,
    normalize_schedule,
)

__all__ = [
    "greedy_decode",
    "argmax_last",
    "build_prompt",
    "compression_ratio",
    "needs_fallback",
    "normalize_schedule",
]
