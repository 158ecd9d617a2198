from whisper_tpu.decode.greedy import greedy_decode, argmax_last
from whisper_tpu.decode.prompt import build_prompt

__all__ = ["greedy_decode", "argmax_last", "build_prompt"]
