"""Sequential long-form transcription (decode/sequential.py +
Engine.transcribe_sequential): openai seek-loop semantics under static
prompt-length buckets."""

import jax
import numpy as np
import pytest

from whisper_tpu.decode.sequential import (
    MIN_ADVANCE_SECONDS,
    PREFIX_LENS,
    WINDOW_SECONDS,
    choose_prefix_len,
    crop_prefix,
    window_emit_and_advance,
)

BEG = 50364  # <|0.00|> in the multilingual layout
EOT = 50257


def ts(seconds: float) -> int:
    return BEG + int(round(seconds / 0.02))


class TestPrefixBuckets:
    def test_zero_without_context(self):
        assert choose_prefix_len(0) == 0
        assert crop_prefix([]) == []

    def test_menu_is_static(self):
        # every possible count maps into the fixed menu (or 0 = not yet)
        seen = {choose_prefix_len(n) for n in range(1, 500)}
        assert seen <= set(PREFIX_LENS) | {0}

    def test_crop_keeps_most_recent(self):
        prev = list(range(1000, 1300))
        out = crop_prefix(prev)
        assert len(out) == PREFIX_LENS[-1]
        assert out == prev[-PREFIX_LENS[-1]:]

    def test_short_context_skips_conditioning(self):
        # Fewer tokens than the smallest bucket: NO conditioning rather than
        # synthetic padding (repeated-token prompts trigger hallucination —
        # ADVICE r2 #1); conditioning starts once a bucket's worth exists.
        assert crop_prefix([7, 8, 9]) == []
        prev = list(range(PREFIX_LENS[0]))
        assert crop_prefix(prev) == prev  # exactly one bucket: all real

    def test_crop_is_always_real_tokens(self):
        # Between buckets, crop DOWN to the largest bucket that fits —
        # every emitted token is real transcript, never padding.
        n = PREFIX_LENS[1] + 5
        prev = list(range(n))
        out = crop_prefix(prev)
        assert len(out) == PREFIX_LENS[1]
        assert out == prev[-PREFIX_LENS[1]:]


class TestWindowAdvance:
    def test_no_timestamps_full_window(self):
        emit, adv = window_emit_and_advance([10, 11, 12], BEG, EOT)
        assert emit == [10, 11, 12]
        assert adv == WINDOW_SECONDS

    def test_consecutive_pair_advances_to_segment_end(self):
        # Decode cut off mid-segment (ends on text): the pair's 2nd ts OPENS
        # the unfinished segment, which re-decodes next window (openai
        # last_slice); seek advances to the pair's timestamp value.
        toks = [ts(0.0), 10, 11, ts(2.5), ts(2.5), 12]
        emit, adv = window_emit_and_advance(toks, BEG, EOT)
        assert emit == toks[:4]
        assert adv == pytest.approx(2.5)

    def test_last_pair_wins(self):
        toks = [
            ts(0.0), 10, ts(1.0), ts(1.0), 11, ts(3.0), ts(3.0), 12
        ]
        emit, adv = window_emit_and_advance(toks, BEG, EOT)
        assert adv == pytest.approx(3.0)
        assert emit == toks[:6]

    def test_single_timestamp_ending_finalizes_all(self):
        # openai single_timestamp_ending (transcribe.py): a pair occurred
        # earlier but the decode ENDED with [text, ts] — the final segment
        # closed naturally, nothing follows: emit everything, advance the
        # full window (no redundant re-decode of the last segment).
        toks = [ts(0.0), 10, 11, ts(2.5), ts(2.5), 12, ts(4.0)]
        emit, adv = window_emit_and_advance(toks, BEG, EOT)
        assert emit == toks
        assert adv == WINDOW_SECONDS

    def test_eot_truncates(self):
        toks = [ts(0.0), 10, ts(1.5), ts(1.5), EOT, 99, 99]
        emit, adv = window_emit_and_advance(toks, BEG, EOT)
        assert emit == toks[:3]
        assert adv == pytest.approx(1.5)

    def test_minimum_advance_guard(self):
        toks = [ts(0.0), ts(0.0), 10]
        _, adv = window_emit_and_advance(toks, BEG, EOT)
        assert adv >= MIN_ADVANCE_SECONDS

    def test_single_trailing_timestamp_full_window(self):
        # no consecutive pair: the decode ran to the budget mid-segment
        toks = [ts(0.0), 10, 11, ts(7.0)]
        emit, adv = window_emit_and_advance(toks, BEG, EOT)
        assert emit == toks
        assert adv == WINDOW_SECONDS


class TestEngineSequential:
    @pytest.fixture(scope="class")
    def engine(self):
        from whisper_tpu.config import EngineConfig
        from whisper_tpu.engine import EngineType, create_engine

        return create_engine(
            EngineType.MONOLITH,
            EngineConfig(
                model="dev", language="en", max_new_tokens=6,
                dtype="float32",
            ),
            seed=0,
        )

    def test_long_audio_terminates_and_times_are_monotonic(self, engine):
        rng = np.random.default_rng(0)
        samples = (0.05 * rng.standard_normal(16_000 * 70)).astype(np.float32)
        result = engine.transcribe_sequential(samples)
        assert result.segments is not None
        starts = [s.start for s in result.segments]
        assert starts == sorted(starts)
        # every segment lies within the audio+window horizon
        assert all(0.0 <= s.start <= 100.0 for s in result.segments)
        assert isinstance(result.text, str)

    def test_executable_reuse_across_windows(self, engine):
        rng = np.random.default_rng(1)
        samples = (0.05 * rng.standard_normal(16_000 * 95)).astype(np.float32)
        engine.transcribe_sequential(samples)
        # prompt-length menu bounds the distinct jit programs
        assert len(engine._seq_programs) <= len(PREFIX_LENS) + 1

    def test_short_audio_single_window(self, engine):
        samples = np.zeros(8000, np.float32)
        result = engine.transcribe_sequential(samples)
        assert result.language == "en"

    def test_no_conditioning_mode(self, engine):
        samples = np.zeros(16_000 * 40, np.float32)
        result = engine.transcribe_sequential(
            samples, condition_on_previous_text=False
        )
        assert result is not None
