"""whisper-tpu: a TPU-native Whisper inference framework (JAX/XLA/Pallas/pjit).

Built from scratch with the capabilities of the reference CPU stack
jerinphilip/whisper.tflite (see SURVEY.md). The compute path is pure JAX —
jit/pjit programs with Pallas kernels for the hot ops — rather than an
interpreter walking a flatbuffer graph (reference L1, whisper.h:128-138).
"""

from whisper_tpu.config import ModelDims, EngineConfig, MODEL_DIMS
from whisper_tpu.tokenizer.vocab import Vocab
from whisper_tpu.tokenizer.languages import language_id, lang_code, LANGUAGES

__version__ = "0.1.0"

__all__ = [
    "ModelDims",
    "EngineConfig",
    "MODEL_DIMS",
    "Vocab",
    "language_id",
    "lang_code",
    "LANGUAGES",
]


def __getattr__(name):
    # Lazy imports so `import whisper_tpu` stays cheap (no jax import) for
    # host-only tooling like the .bin asset packager.
    if name in ("Engine", "Monolith", "EncDec", "create_engine", "EngineType"):
        from whisper_tpu.engine import engine as _engine

        return getattr(_engine, name)
    raise AttributeError(f"module 'whisper_tpu' has no attribute {name!r}")
