from whisper_tpu.engine.engine import (
    Engine,
    EngineType,
    Monolith,
    EncDec,
    create_engine,
    TranscriptionResult,
)

__all__ = [
    "Engine",
    "EngineType",
    "Monolith",
    "EncDec",
    "create_engine",
    "TranscriptionResult",
]
