from whisper_tpu.ops.attention import fused_self_attention

__all__ = ["fused_self_attention"]
