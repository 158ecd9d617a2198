"""Tracing, stage timing, and throughput metrics.

The reference's observability is ``gettimeofday`` printf timers — the
``TIME_DIFF_MS`` macro (reference whisper.h:19-22) printed around the
spectrogram and interpreter calls (whisper.cpp:708-710, 723-725, 294-299) and
a commented-out end-to-end millisecond log in Java (Whisper.java:117-120).
This module is the structured TPU equivalent:

* :class:`StageTimer` — named wall-clock stages with aggregation (count,
  total, mean, last) and a context-manager interface;
* :class:`Throughput` — audio-seconds/s, tokens/s, utterances counters (the
  units BASELINE.json scores);
* :func:`trace` — ``jax.profiler`` trace context for real device timelines
  (XProf-viewable), replacing printf timing with proper TPU profiling;
* :func:`annotate` — named trace regions visible inside the device timeline;
* ``DEBUG``-gated tensor dumps (:func:`debug_dump`) mirroring the reference's
  env-gated ``inspect_tflite_tensor`` / per-step argmax traces
  (whisper.cpp:273-282, 387-390; same ``DEBUG`` env var).
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import os
import time
from typing import Dict, Iterator, Optional

logger = logging.getLogger("whisper_tpu")


# --- DEBUG-gated dumps (reference whisper.cpp:273-282) -----------------------
def debug_enabled() -> bool:
    return bool(os.environ.get("DEBUG"))


def debug_dump(name: str, array) -> None:
    """Shape/dtype/sample dump when $DEBUG is set — the role of
    inspect_tflite_tensor (whisper.cpp:273-282)."""
    if not debug_enabled():
        return
    import numpy as np

    a = np.asarray(array)
    head = np.array2string(a.reshape(-1)[:8], precision=4, separator=", ")
    logger.info("DEBUG %s: shape=%s dtype=%s head=%s", name, a.shape, a.dtype, head)


# --- Stage timers ------------------------------------------------------------
@dataclasses.dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    last_s: float = 0.0

    @property
    def mean_s(self) -> float:
        return self.total_s / self.count if self.count else 0.0


class StageTimer:
    """Accumulating named wall-clock stages.

    >>> timer = StageTimer()
    >>> with timer.stage("encode"):
    ...     run_encoder()
    >>> timer.summary()["encode"].mean_s
    """

    def __init__(self) -> None:
        self._stats: Dict[str, StageStats] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self._stats.setdefault(name, StageStats())
            s.count += 1
            s.total_s += dt
            s.last_s = dt

    def record(self, name: str, seconds: float) -> None:
        s = self._stats.setdefault(name, StageStats())
        s.count += 1
        s.total_s += seconds
        s.last_s = seconds

    def summary(self) -> Dict[str, StageStats]:
        return dict(self._stats)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"count": v.count, "total_ms": v.total_s * 1e3,
                "mean_ms": v.mean_s * 1e3, "last_ms": v.last_s * 1e3}
            for k, v in self._stats.items()
        }

    def reset(self) -> None:
        self._stats.clear()


# --- Throughput counters -----------------------------------------------------
@dataclasses.dataclass
class Throughput:
    """Counters in BASELINE.json's units: audio-seconds/s per chip is the
    primary metric; tokens/s and real-time factor derive from the same
    counters."""

    audio_seconds: float = 0.0
    tokens: int = 0
    utterances: int = 0
    wall_s: float = 0.0

    def add(self, audio_seconds: float, tokens: int, utterances: int,
            wall_s: float) -> None:
        self.audio_seconds += audio_seconds
        self.tokens += tokens
        self.utterances += utterances
        self.wall_s += wall_s

    @property
    def audio_seconds_per_s(self) -> float:
        return self.audio_seconds / self.wall_s if self.wall_s else 0.0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.wall_s if self.wall_s else 0.0

    @property
    def rtf(self) -> float:
        """Real-time factor: processing time per audio second (<1 is faster
        than realtime; the reference's Android anecdote is RTF ≈ 10)."""
        return self.wall_s / self.audio_seconds if self.audio_seconds else 0.0

    def as_dict(self) -> Dict[str, float]:
        return {
            "audio_seconds": self.audio_seconds,
            "tokens": self.tokens,
            "utterances": self.utterances,
            "wall_s": self.wall_s,
            "audio_seconds_per_s": self.audio_seconds_per_s,
            "tokens_per_s": self.tokens_per_s,
            "rtf": self.rtf,
        }


# --- jax.profiler integration ------------------------------------------------
@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a device profile under the context (view with XProf /
    tensorboard-plugin-profile). No-ops cleanly if profiling is unavailable
    (e.g. another trace is active)."""
    import jax

    log_dir = log_dir or os.environ.get("WHISPER_TPU_TRACE_DIR", "/tmp/whisper_tpu_trace")
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - profiler capability varies
        logger.warning("profiler trace unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                logger.warning("profiler stop failed: %s", e)


def annotate(name: str):
    """Named region inside the device timeline (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
