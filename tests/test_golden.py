"""THE golden contract (SURVEY.md §2a.11): whisper-tiny.en on the LibriSpeech
dummy clip must reproduce the reference's 21 exact token IDs
(/root/reference/whisper.tflite/whisper.h:27-32; WhisperUtil.java:337-340)
end-to-end through ``create_engine(MONOLITH)``.

This environment has zero network egress and no cached checkpoints (verified
round 2 — no HF cache, no asset mount), so the test is GATED on env vars and
runs automatically wherever real assets exist:

    WHISPER_TPU_CKPT=<tiny.en HF dir | .pt | converted .npz>
    WHISPER_TPU_GOLDEN_WAV=<LibriSpeech dummy sample wav, 16 kHz mono>

``python tools/fetch_assets.py`` downloads both (network required) and then
runs this file. Until a run records success, all token-parity claims in
PARITY.md rest on the torch-architecture differential tests
(tests/test_convert_hf.py), which validate the compute graph but not the
full asset chain.
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("WHISPER_TPU_CKPT")
WAV = os.environ.get("WHISPER_TPU_GOLDEN_WAV")

GOLDEN_IDS = [
    50257, 50362, 1770, 13, 2264, 346, 353, 318, 262, 46329, 286, 262,
    3504, 6097, 11, 290, 356, 389, 9675, 284, 7062,
]  # whisper.h:27-32 — "Mr. Quilter is the apostle of the middle classes…"
GOLDEN_TEXT = (
    " Mr. Quilter is the apostle of the middle classes and we are glad"
)

pytestmark = pytest.mark.skipif(
    not (CKPT and WAV),
    reason="real-weight golden test: set WHISPER_TPU_CKPT and "
    "WHISPER_TPU_GOLDEN_WAV (tools/fetch_assets.py downloads both)",
)


@pytest.fixture(scope="module")
def engine():
    from whisper_tpu.config import EngineConfig
    from whisper_tpu.engine import EngineType, create_engine
    from whisper_tpu.models.convert import load_checkpoint

    params, dims = load_checkpoint(CKPT)
    config = EngineConfig(
        model="tiny.en",
        language="en",
        dtype="float32",  # parity first; bf16 benchmarked separately
        max_new_tokens=64,
        # The golden contract is openai's fixed 30 s window numerics
        # (whisper.h:27-32 was produced with full audio context); the
        # default audio_ctx="auto" crop is a documented deviation for
        # short audio (PARITY.md) and is pinned off here.
        audio_ctx=None,
    )
    assert config.dims() == dims, "checkpoint is not tiny.en-shaped"
    return create_engine(EngineType.MONOLITH, config, params=params)


def test_golden_token_ids(engine):
    result = engine.transcribe(WAV)
    got = [int(t) for t in result.tokens[: result.length]]
    # The reference's golden list stops at its 30-token budget; compare the
    # full golden prefix (prompt included).
    assert got[: len(GOLDEN_IDS)] == GOLDEN_IDS, got[:32]


def test_golden_text_prefix(engine):
    result = engine.transcribe(WAV)
    assert result.clean_text().startswith(GOLDEN_TEXT.strip()[:40])


def test_golden_beam_matches_greedy_start(engine):
    """Beam=5 on clean speech agrees with greedy on this clip (openai
    observes identical transcripts here); pins beam search on real weights."""
    import dataclasses

    from whisper_tpu.engine import EngineType, create_engine
    from whisper_tpu.models.convert import load_checkpoint

    params, _ = load_checkpoint(CKPT)
    config = dataclasses.replace(engine.config, beam_size=5)
    beam_engine = create_engine(EngineType.MONOLITH, config, params=params)
    result = beam_engine.transcribe(WAV)
    got = [int(t) for t in result.tokens[: result.length]]
    assert got[: len(GOLDEN_IDS)] == GOLDEN_IDS, got[:32]
