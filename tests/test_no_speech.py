"""No-speech gate (config.no_speech_threshold): the <|nospeech|>
probability read at the SOT position of the prefill logits, and the
openai-style skip/override semantics."""

import numpy as np
import pytest

from whisper_tpu.config import EngineConfig
from whisper_tpu.engine import EngineType, create_engine


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(21)
    return (0.1 * rng.standard_normal((2, 16_000))).astype(np.float32)


def _cfg(**kw):
    base = dict(model="dev", language="en", max_new_tokens=4, dtype="float32")
    base.update(kw)
    return EngineConfig(**base)


class TestNoSpeech:
    def test_prob_surfaced_and_valid(self, audio):
        eng = create_engine(
            EngineType.MONOLITH, _cfg(no_speech_threshold=0.6), seed=0
        )
        res = eng.transcribe_batch(audio)
        for r in res:
            assert r.no_speech_prob is not None
            assert 0.0 <= r.no_speech_prob <= 1.0

    def test_off_by_default(self, audio):
        eng = create_engine(EngineType.MONOLITH, _cfg(), seed=0)
        r = eng.transcribe_batch(audio)[0]
        assert r.no_speech_prob is None and not r.is_silent

    def test_gate_forces_empty_text(self, audio):
        # threshold 0 → any nonzero nospeech prob trips the gate; with the
        # logprob override disabled the text must be emptied.
        eng = create_engine(
            EngineType.MONOLITH,
            _cfg(no_speech_threshold=0.0, logprob_threshold=None),
            seed=0,
        )
        res = eng.transcribe_batch(audio)
        for r in res:
            if r.no_speech_prob > 0.0:
                assert r.is_silent and r.text == ""
            assert r.length >= 4  # tokens still recorded

    def test_confident_logprob_overrides(self, audio):
        # fallback machinery provides avg_logprob; logprob_threshold=-inf-ish
        # means every decode counts as confident → gate never fires.
        eng = create_engine(
            EngineType.MONOLITH,
            _cfg(
                no_speech_threshold=0.0,
                fallback_temperatures=(0.5,),
                logprob_threshold=-1e9,
                compression_ratio_threshold=None,
            ),
            seed=0,
        )
        res = eng.transcribe_batch(audio)
        for r in res:
            assert r.avg_logprob is not None
            assert not r.is_silent and r.text != ""

    def test_token_parity_with_gate_off(self, audio):
        a = create_engine(EngineType.MONOLITH, _cfg(), seed=0)
        b = create_engine(
            EngineType.MONOLITH, _cfg(no_speech_threshold=0.9), seed=0
        )
        ra = a.transcribe_batch(audio)
        rb = b.transcribe_batch(audio)
        for x, y in zip(ra, rb):
            assert list(x.tokens) == list(y.tokens)

    def test_beam_path_surfaces_prob(self, audio):
        eng = create_engine(
            EngineType.MONOLITH,
            _cfg(beam_size=2, no_speech_threshold=0.6),
            seed=0,
        )
        r = eng.transcribe_batch(audio[:1])[0]
        assert r.no_speech_prob is not None

    def test_encdec_path(self, audio):
        eng = create_engine(
            EngineType.ENCDEC, _cfg(no_speech_threshold=0.6), seed=0
        )
        r = eng.transcribe_batch(audio[:1])[0]
        assert r.no_speech_prob is not None
