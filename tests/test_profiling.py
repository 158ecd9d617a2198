"""Profiling/metrics subsystem tests (utils/profiling.py) — the structured
replacement for the reference's printf timers (whisper.h:19-22)."""

import logging
import time

import numpy as np
import pytest

from whisper_tpu.utils.profiling import (
    StageTimer,
    Throughput,
    annotate,
    debug_dump,
    debug_enabled,
)


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        for _ in range(3):
            with t.stage("work"):
                time.sleep(0.001)
        s = t.summary()["work"]
        assert s.count == 3
        assert s.total_s >= 0.003
        assert s.mean_s == pytest.approx(s.total_s / 3)
        assert 0 < s.last_s <= s.total_s

    def test_record_and_dict(self):
        t = StageTimer()
        t.record("mel", 0.25)
        t.record("mel", 0.75)
        d = t.as_dict()["mel"]
        assert d["count"] == 2
        assert d["total_ms"] == pytest.approx(1000.0)
        assert d["mean_ms"] == pytest.approx(500.0)
        t.reset()
        assert t.summary() == {}

    def test_exception_still_recorded(self):
        t = StageTimer()
        with pytest.raises(RuntimeError):
            with t.stage("boom"):
                raise RuntimeError("x")
        assert t.summary()["boom"].count == 1


class TestThroughput:
    def test_rates(self):
        m = Throughput()
        m.add(audio_seconds=60.0, tokens=100, utterances=2, wall_s=2.0)
        m.add(audio_seconds=30.0, tokens=50, utterances=1, wall_s=1.0)
        assert m.audio_seconds_per_s == pytest.approx(30.0)
        assert m.tokens_per_s == pytest.approx(50.0)
        assert m.rtf == pytest.approx(1.0 / 30.0)
        d = m.as_dict()
        assert d["utterances"] == 3

    def test_zero_safe(self):
        m = Throughput()
        assert m.audio_seconds_per_s == 0.0 and m.rtf == 0.0


class TestDebugDump:
    def test_gated_off_by_default(self, monkeypatch, caplog):
        monkeypatch.delenv("DEBUG", raising=False)
        assert not debug_enabled()
        with caplog.at_level(logging.INFO, logger="whisper_tpu"):
            debug_dump("x", np.ones(4))
        assert caplog.text == ""

    def test_dumps_when_enabled(self, monkeypatch, caplog):
        monkeypatch.setenv("DEBUG", "1")
        with caplog.at_level(logging.INFO, logger="whisper_tpu"):
            debug_dump("mel", np.arange(20.0).reshape(4, 5))
        assert "mel" in caplog.text and "(4, 5)" in caplog.text


class TestAnnotate:
    def test_annotation_context(self):
        with annotate("encode"):
            pass  # must not raise on CPU


class TestEngineIntegration:
    def test_engine_counters(self, rng):
        from whisper_tpu.config import EngineConfig
        from whisper_tpu.engine.engine import EngineType, create_engine

        eng = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", max_new_tokens=3,
                         dtype="float32"),
        )
        eng.transcribe(rng.normal(size=16000).astype(np.float32) * 0.1)
        eng.transcribe(rng.normal(size=16000).astype(np.float32) * 0.1)
        assert eng.throughput.utterances == 2
        assert eng.throughput.audio_seconds == pytest.approx(2.0)
        assert eng.throughput.tokens > 0
        assert eng.timer.summary()["model"].count == 2
