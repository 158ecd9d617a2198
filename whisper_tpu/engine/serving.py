"""Async serving: request queue → micro-batcher → device executor, plus
streaming sessions.

Generalizes the reference's Java orchestration layer (SURVEY.md §2 rows
23-24): ``Whisper.java`` runs one file-transcription worker guarded by an
``AtomicBoolean`` (Whisper.java:52-79) and a mic producer/consumer thread
pair over a locked queue that transcribes ONE buffer at a time under a global
engine lock (Whisper.java:130-174). On TPU the equivalent resource is a
compiled program that *wants* batches: the batcher coalesces concurrent
requests into one device dispatch (static batch shape = one compiled
executable per bucket), which is where the throughput multiplier in
BENCH results comes from.

Listener callbacks mirror IWhisperListener (onUpdate/onResult,
IWhisperListener.java:3-7); the future-based API is the Python-native
surface.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

from whisper_tpu.config import N_SAMPLES
from whisper_tpu.engine.engine import Engine, TranscriptionResult

# Status strings kept from the reference (Whisper.java:12-14).
MSG_PROCESSING = "Processing..."
MSG_DONE = "Processing done...!"


@dataclass
class _Request:
    samples: np.ndarray
    future: Future


class AsyncTranscriber:
    """Micro-batching async front-end over an Engine.

    Requests submitted from any thread are coalesced for up to
    ``max_wait_ms`` or until ``max_batch`` requests are pending, then run as
    one padded device batch. Shapes stay static (everything pads to 30 s), so
    there is exactly one compiled executable regardless of arrival pattern.
    """

    def __init__(
        self,
        engine: Engine,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        on_status: Optional[Callable[[str], None]] = None,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.on_status = on_status
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._closed = False
        self._thread.start()

    # --- public API --------------------------------------------------------
    def submit(self, samples: np.ndarray) -> Future:
        """Enqueue an utterance; resolves to a TranscriptionResult."""
        if self._closed:
            raise RuntimeError("transcriber is closed")
        fut: Future = Future()
        self._queue.put(_Request(np.asarray(samples, np.float32), fut))
        return fut

    def transcribe(self, samples: np.ndarray) -> TranscriptionResult:
        return self.submit(samples).result()

    def close(self, wait: bool = True) -> None:
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            if wait:
                self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --- worker ------------------------------------------------------------
    def _worker(self) -> None:
        while True:
            req = self._queue.get()
            if req is None:
                return
            batch = [req]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(batch)
                    return
                batch.append(nxt)
            self._flush(batch)

    def _flush(self, batch: List[_Request]) -> None:
        if self.on_status:
            self.on_status(MSG_PROCESSING)
        stacked = np.zeros((len(batch), N_SAMPLES), dtype=np.float32)
        for i, r in enumerate(batch):
            n = min(len(r.samples), N_SAMPLES)
            stacked[i, :n] = r.samples[:n]
        try:
            # Per-batch error isolation (SURVEY.md §5 failure handling): a bad
            # batch fails its own futures, the serving loop survives.
            results = self.engine.transcribe_batch(stacked)
            for r, res in zip(batch, results):
                r.future.set_result(res)
        except Exception as e:  # noqa: BLE001
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
        if self.on_status:
            self.on_status(MSG_DONE)


class StreamingSession:
    """Realtime producer/consumer session (the mic pipeline,
    Whisper.java:130-174): ``write_buffer`` feeds audio from a capture
    thread; a consumer accumulates into 30 s-max utterances (optionally
    splitting at VAD silences) and emits results via the listener callback.
    """

    def __init__(
        self,
        transcriber: AsyncTranscriber,
        on_result: Callable[[TranscriptionResult], None],
        on_update: Optional[Callable[[str], None]] = None,
        min_chunk_samples: int = 16_000,  # flush granularity: 1 s
        use_vad: bool = True,
    ):
        self.transcriber = transcriber
        self.on_result = on_result
        self.on_update = on_update
        self.min_chunk = min_chunk_samples
        self.use_vad = use_vad
        self._buf: List[np.ndarray] = []
        self._buffered = 0
        self._queue: "queue.Queue[Optional[np.ndarray]]" = queue.Queue()
        self._thread = threading.Thread(target=self._consume, daemon=True)
        self._thread.start()

    def write_buffer(self, samples: np.ndarray) -> None:
        """Producer side (Whisper.java:131-135)."""
        self._queue.put(np.asarray(samples, np.float32))

    def stop(self) -> None:
        """Flush remaining audio and stop the consumer."""
        self._queue.put(None)
        self._thread.join()

    def _consume(self) -> None:
        while True:
            chunk = self._queue.get()
            if chunk is None:
                self._flush()
                return
            self._buf.append(chunk)
            self._buffered += len(chunk)
            if self._buffered >= N_SAMPLES:
                self._flush()
            elif self.use_vad and self._buffered >= self.min_chunk:
                # Flush at a trailing silence so utterances end cleanly.
                from whisper_tpu.audio.vad import energy_vad

                tail = chunk[-2048:]
                if len(tail) >= 512 and not energy_vad(tail).any():
                    self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        utterance = np.concatenate(self._buf)[:N_SAMPLES]
        self._buf, self._buffered = [], 0
        if self.on_update:
            self.on_update(MSG_PROCESSING)
        result = self.transcriber.transcribe(utterance)
        self.on_result(result)
