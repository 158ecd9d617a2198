"""Timestamp segment parsing (decode/segments.py) and long-audio
transcription (Engine.transcribe_long) tests."""

import numpy as np
import pytest

from whisper_tpu.config import EngineConfig
from whisper_tpu.decode.segments import Segment, parse_segments
from whisper_tpu.engine.engine import EngineType, create_engine
from whisper_tpu.tokenizer.vocab import Vocab


@pytest.fixture(scope="module")
def vocab():
    return Vocab.synthetic(multilingual=False)


class TestParseSegments:
    def test_no_timestamps_single_window(self, vocab):
        st = vocab.specials
        toks = [st.sot, st.not_, 100, 200, 300, st.eot]
        segs = parse_segments(vocab, toks)
        assert len(segs) == 1
        assert segs[0].start == 0.0 and segs[0].end == 30.0
        assert segs[0].tokens == (100, 200, 300)

    def test_two_segments(self, vocab):
        st = vocab.specials
        # <|0.00|> a b <|1.00|> <|1.00|> c <|2.00|> eot
        t0, t50, t100 = st.beg, st.beg + 50, st.beg + 100
        toks = [st.sot, t0, 100, 200, t50, t50, 300, t100, st.eot]
        segs = parse_segments(vocab, toks)
        assert len(segs) == 2
        assert segs[0].start == pytest.approx(0.0)
        assert segs[0].end == pytest.approx(1.0)
        assert segs[0].tokens == (100, 200)
        assert segs[1].start == pytest.approx(1.0)
        assert segs[1].end == pytest.approx(2.0)
        assert segs[1].tokens == (300,)

    def test_trailing_open_segment_closes_at_window_end(self, vocab):
        st = vocab.specials
        toks = [st.sot, st.beg + 10, 100, st.eot]
        segs = parse_segments(vocab, toks)
        assert len(segs) == 1
        assert segs[0].start == pytest.approx(0.2)
        assert segs[0].end == pytest.approx(30.0)

    def test_time_offset_applied(self, vocab):
        st = vocab.specials
        toks = [st.beg, 100, st.beg + 100, st.eot]
        segs = parse_segments(vocab, toks, time_offset=60.0)
        assert segs[0].start == pytest.approx(60.0)
        assert segs[0].end == pytest.approx(62.0)

    def test_empty(self, vocab):
        st = vocab.specials
        assert parse_segments(vocab, [st.sot, st.eot]) == []


class TestTranscribeLong:
    @pytest.fixture(scope="class")
    def engine(self):
        return create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev.en", max_new_tokens=3, dtype="float32"),
        )

    def _audio_with_bursts(self, rng, seconds, burst_at):
        sr = 16_000
        x = rng.normal(size=sr * seconds).astype(np.float32) * 0.001
        t = np.arange(sr) / sr
        burst = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        for s in burst_at:
            x[s * sr : s * sr + sr] += burst
        return x

    def test_short_audio_single_chunk(self, engine, rng):
        x = self._audio_with_bursts(rng, 5, [1])
        res = engine.transcribe_long(x)
        assert len(res.chunks) == 1 and res.offsets == [0.0]

    def test_long_audio_vad_chunks(self, engine, rng):
        x = self._audio_with_bursts(rng, 75, [5, 40, 70])
        res = engine.transcribe_long(x)
        assert len(res.chunks) >= 2
        assert res.offsets == sorted(res.offsets)
        # chunk windows start at (or before) the speech bursts they cover
        assert res.offsets[0] <= 5.0 + 0.5
        assert all(isinstance(c.text, str) for c in res.chunks)

    def test_continuous_long_audio_hard_split(self, engine, rng):
        # speech everywhere → spans longer than 30 s must hard-split
        sr = 16_000
        t = np.arange(sr * 65) / sr
        x = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        res = engine.transcribe_long(x)
        assert len(res.chunks) >= 3  # 65 s → ≥3 windows
        assert res.offsets[1] - res.offsets[0] == pytest.approx(30.0, abs=1.0)
