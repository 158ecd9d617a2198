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
from functools import partial
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
    one device batch. Every flush is padded to the full ``max_batch`` shape
    (zero rows for missing requests) and utterances pad to 30 s, so there is
    exactly one compiled executable regardless of arrival pattern — asserted
    by tests/test_serving_cli.py::test_async_single_compilation. Pick
    ``max_batch`` for the steady-state load: zero rows burn device time, a
    recompile burns seconds.
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
    def warmup(self) -> None:
        """Compile the flush-shaped pipeline for every audio_ctx crop
        bucket up front — under the default audio_ctx="auto" each length
        class otherwise hits its multi-second compile on the first live
        request that reaches it (review r5)."""
        from whisper_tpu.engine.engine import (
            AUDIO_CTX_BUCKETS,
            AUDIO_CTX_MARGIN,
            _SAMPLES_PER_POS,
        )

        if self.engine.config.audio_ctx == "auto":
            lens = [
                (b - AUDIO_CTX_MARGIN - 1) * _SAMPLES_PER_POS
                for b in AUDIO_CTX_BUCKETS
            ] + [N_SAMPLES]
        else:
            lens = [N_SAMPLES]
        for n in lens:
            x = np.zeros((self.max_batch, min(n, N_SAMPLES)), np.float32)
            x[:, -1] = 1e-4  # content through the last sample pins the bucket
            self.engine.transcribe_batch(x)

    def _bucket_of(self, samples: np.ndarray) -> int:
        """Length-aware admission key (r5): utterances whose audio_ctx
        crop resolves identically batch together, so the "auto" crop
        (engine.py _resolve_audio_ctx) actually applies under mixed-length
        load — one 30 s utterance in a FIFO batch of 3 s clips would
        otherwise pin every row to the full window. Keyed on measured
        CONTENT (last non-zero sample — the same scan the engine resolves
        the crop from), not buffer length: VAD/ring-buffer callers submit
        fixed-size zero-padded buffers whose content is short (review
        r5). Constant (single group, legacy FIFO) unless the engine runs
        audio_ctx="auto"."""
        if self.engine.config.audio_ctx != "auto":
            return 0
        from whisper_tpu.engine.engine import (
            last_content_index,
            snap_audio_ctx,
        )

        last = last_content_index(samples[None, : N_SAMPLES])
        return snap_audio_ctx(last, self.engine.dims.n_audio_ctx) or 0

    def _flush_group(
        self, pending: List[tuple], bucket: Optional[int] = None
    ) -> List[tuple]:
        """Flush up to max_batch pending ``(arrival_ts, bucket, request)``
        entries of one bucket — the given one, else the OLDEST entry's.
        Returns the rest."""
        b0 = pending[0][1] if bucket is None else bucket
        take: List[_Request] = []
        keep: List[tuple] = []
        for entry in pending:
            if len(take) < self.max_batch and entry[1] == b0:
                take.append(entry[2])
            else:
                keep.append(entry)
        self._flush(take)
        return keep

    def _worker(self) -> None:
        # Entries are (arrival_ts, bucket, request) in arrival order. The
        # flush deadline is anchored to the OLDEST pending arrival — NOT
        # reset per loop iteration — so a minority-bucket request's wait
        # is bounded by max_wait even under a sustained stream that keeps
        # filling other buckets (review r5: a per-iteration deadline let
        # full-bucket flushes starve the head indefinitely).
        pending: List[tuple] = []

        def admit(req):
            pending.append(
                (time.monotonic(), self._bucket_of(req.samples), req)
            )

        while True:
            if not pending:
                req = self._queue.get()
                if req is None:
                    return
                admit(req)
            full_bucket = None
            while True:
                head_deadline = pending[0][0] + self.max_wait_s
                counts: dict = {}
                for _, b, _r in pending:
                    counts[b] = counts.get(b, 0) + 1
                full_bucket = next(
                    (b for b, c in counts.items() if c >= self.max_batch),
                    None,
                )
                if full_bucket is not None:
                    break
                timeout = head_deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    while pending:
                        pending = self._flush_group(pending)
                    return
                admit(nxt)
            if full_bucket is not None and pending[0][0] + self.max_wait_s <= (
                time.monotonic()
            ):
                # The head's wait expired while another bucket filled:
                # serve the head's bucket first, then the full one on the
                # next iteration (still pending and still full).
                full_bucket = None
            # A FULL bucket flushes as a whole batch (flushing the head's
            # possibly-singleton bucket before its deadline would dispatch
            # undersized batches); deadline expiry flushes the head's
            # bucket, FIFO-fair with a max_wait-bounded wait.
            pending = self._flush_group(pending, full_bucket)

    def _flush(self, batch: List[_Request]) -> None:
        if self.on_status:
            self.on_status(MSG_PROCESSING)
        # Always dispatch at the full max_batch shape: a partial flush padded
        # with zero rows reuses the one compiled executable instead of
        # compiling one per distinct arrival count (a multi-second stall the
        # first time each size appears). Zero rows cost device FLOPs but the
        # batch dimension is cheap next to a recompile; results for them are
        # dropped below. Pinned by tests/test_serving_cli.py.
        stacked = np.zeros((self.max_batch, N_SAMPLES), dtype=np.float32)
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


class _ContinuousBase:
    """Shared machinery for slot-pool serving (decode/continuous.py):
    compiled prefill/step/insert programs, slot bookkeeping, harvest."""

    def __init__(
        self,
        engine: Engine,
        n_slots: int = 8,
        prefill_batch: int = 2,
        sync_every: int = 4,  # decode steps per host dispatch (the slot
        # pool's macro-step). Round-4 A/B on the tunneled backend
        # (benchmarks/serving_tiny_r04.json): 4 → 30.8 audio-s/s,
        # 16 → 28.3, 32 → 27.1 — deeper macro-steps overshoot finished
        # slots more than they save in dispatch RTT on short decodes, so 4
        # stays the default; the while_loop's on-device active-mask exit
        # makes ANY depth safe for an emptying pool (raise it for long
        # decode budgets on high-RTT links).
        omit_special_tokens: bool = True,
        encode_device=None,
        slot_buckets: Optional[List[int]] = None,
    ):
        import jax
        import jax.numpy as jnp

        from whisper_tpu.decode import continuous as cont
        from whisper_tpu.frontend.mel import log_mel_spectrogram
        from whisper_tpu.models.encoder import encode

        if engine.config.beam_size > 1:
            raise ValueError("continuous batching is greedy-only")
        self.engine = engine
        self.n_slots = n_slots
        self.prefill_batch = prefill_batch
        self.sync_every = max(1, sync_every)
        self.omit_special_tokens = omit_special_tokens
        self._encode_device = encode_device
        # Encoder-side params: a replica on the encode device when encode is
        # disaggregated onto its own chip, else the shared tree.
        if encode_device is not None:
            self._encode_params = jax.device_put(
                engine.assets.params, encode_device
            )
            self._encode_filters = jax.device_put(
                engine._filters, encode_device
            )
        else:
            self._encode_params = engine.assets.params
            self._encode_filters = engine._filters

        dims = engine.dims
        eot = engine.vocab.specials.eot
        self._eot = eot
        self._p_len = int(engine._prompt.shape[0])
        total_len = self._p_len + engine._max_new
        self._total_len = total_len
        cdt = engine._compute_dtype
        rules = engine._rules

        # Slot-state geometry is fixed at pool creation, so the crop must be
        # a static int (or full) — see the init_slot_state note below.
        _slot_ac = (
            engine.config.audio_ctx
            if isinstance(engine.config.audio_ctx, int)
            else None
        )

        @jax.jit
        def prefill(params, samples, filters):
            mel = log_mel_spectrogram(
                samples, filters, n_mels=dims.n_mels, compute_dtype=jnp.float32
            )
            enc_out = engine._enc_constraint(
                encode(params, mel.astype(cdt), dims), _slot_ac
            )
            prompts, cross_kv = engine._make_prompts(params, enc_out)
            return cont.prefill_pack(
                params, enc_out, prompts, dims, eot=eot, total_len=total_len,
                rules=rules, logit_bias=engine._logit_bias, compute_dtype=cdt,
                kv_cache_dtype=engine._kv_dtype, cross_kv=cross_kv,
            )

        # Occupancy buckets (VERDICT round-1 weak #10): the step program runs
        # on the prefix sub-pool of the smallest bucket covering the occupied
        # slots, so a mostly-empty pool stops streaming every empty slot's KV
        # each step (per-slot cross-KV is the dominant HBM term for large
        # models — ~160 MB/slot/step on large-v3 fp8). One executable per
        # bucket size, compiled lazily on first use; occupied slots are
        # compacted into the prefix with ``move_slot`` (a one-row cache copy,
        # amortized over every subsequent step). ``slot_buckets=[n_slots]``
        # disables; default = descending powers of two down to
        # max(2, prefill_batch).
        if slot_buckets is None:
            slot_buckets, b = [], n_slots
            while b >= max(2, min(prefill_batch, n_slots)):
                slot_buckets.append(b)
                b //= 2
        buckets = sorted(set(int(b) for b in slot_buckets) | {n_slots})
        if buckets[0] < 1 or buckets[-1] > n_slots:
            raise ValueError(f"slot_buckets out of range: {buckets}")
        self._buckets = buckets

        @partial(jax.jit, static_argnums=(2,), donate_argnums=(1,))
        def step_bucket(params, state, n):
            # One host dispatch advances up to ``sync_every`` decode steps
            # inside a single program, with an ON-DEVICE harvest mask as the
            # early exit: the loop stops the moment every slot goes inactive
            # (EOT/budget), so the host round-trip per macro-step — the
            # dominant cost on a tunneled backend, ~25 ms RTT — amortizes
            # over many steps without burning whole macro-steps on an idle
            # pool (VERDICT r3 weak#2). Host refill happens between
            # macro-steps; a slot finishing mid-macro-step waits at most
            # sync_every-1 steps for its refill (frozen by the active mask,
            # not re-decoded).
            sub = cont.slice_slots(state, n) if n < n_slots else state

            def cond(c):
                i, s = c
                return (i < self.sync_every) & jnp.any(s.active)

            def body(c):
                i, s = c
                return i + 1, cont.decode_step_slots(
                    params, s, dims, eot=eot, sample_begin=self._p_len,
                    rules=rules, logit_bias=engine._logit_bias,
                    compute_dtype=cdt,
                )

            _, sub = jax.lax.while_loop(cond, body, (jnp.int32(0), sub))
            return cont.merge_slots(state, sub) if n < n_slots else sub

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def insert(state, slot, pack, row):
            return cont.insert_slot(state, slot, pack, row)

        @partial(jax.jit, donate_argnums=(0,))
        def move(state, src, dst):
            return cont.move_slot(state, src, dst)

        self._prefill = prefill
        self._step_bucket = step_bucket
        self._insert = insert
        self._move = move
        # Continuous batching admits utterances at arbitrary times into one
        # fixed slot state, so there is no per-batch content to derive a
        # crop from: audio_ctx="auto" resolves to the full window here;
        # an explicit int still applies to every slot.
        slot_ac = (
            engine.config.audio_ctx
            if isinstance(engine.config.audio_ctx, int)
            else None
        )
        self._state = cont.init_slot_state(
            dims, n_slots, total_len, eot,
            cache_dtype=cdt, kv_dtype=engine._kv_dtype,
            audio_ctx=slot_ac,
        )

        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._slot_futures: List[Optional[Future]] = [None] * n_slots
        self._closed = False
        # Harvest source: tiny device COPIES of (active, tokens) taken just
        # before each macro-step dispatch (see _dispatch_step). The state
        # itself is donated to the step program, so it cannot be read
        # afterwards — and reading it before dispatch was a hard sync that
        # serialized every macro-step (cProfile r5: 50% of continuous wall
        # in that fetch). The copies resolve as soon as the PREVIOUS step
        # finishes, so fetching them overlaps the in-flight step.
        self._pending_harvest = None
        # Occupancy accounting (host-side, sync_every granularity). Each step
        # dispatches ``bucket`` slots (the smallest bucket covering the
        # occupied set), not the full pool — ``dispatch_efficiency`` measures
        # how close dispatched slot-steps track genuinely occupied ones.
        self._step_dispatches = 0
        self._occupied_slot_steps = 0
        self._dispatched_slot_steps = 0

    def warmup(self) -> None:
        """Compile every occupancy-bucket step program up front. Without
        this, each bucket size compiles lazily on the first request pattern
        that reaches it — a multi-second stall INSIDE the serving loop
        (cProfile r5: 8 in-loop compiles = 3.6 s of a 10 s CPU run). The
        empty pool makes each warmup dispatch a no-op execution: the
        on-device active-mask early exit fires at entry."""
        import jax

        for b in self._buckets:
            self._state = jax.block_until_ready(
                self._step_bucket(self.engine.assets.params, self._state, b)
            )

    @property
    def occupancy(self) -> float:
        """Mean fraction of the FULL pool occupied across step dispatches
        (sizing signal: persistently low values mean a smaller ``n_slots``
        would serve the load)."""
        total = self._step_dispatches * self.n_slots
        return self._occupied_slot_steps / total if total else 0.0

    @property
    def dispatch_efficiency(self) -> float:
        """occupied slot-steps / dispatched slot-steps (1.0 = bucketing
        eliminated all empty-slot compute a static pool would burn)."""
        return (
            self._occupied_slot_steps / self._dispatched_slot_steps
            if self._dispatched_slot_steps
            else 0.0
        )

    def _dispatch_step(self):
        import jax.numpy as jnp

        occupied = [i for i, f in enumerate(self._slot_futures) if f is not None]
        bucket = next(b for b in self._buckets if b >= len(occupied))
        if occupied and occupied[-1] >= bucket:
            # Compact: move the occupied slots stranded above the bucket
            # boundary down into free rows below it (harvest freed them).
            # One-row cache copies, repaid every subsequent step.
            high = [i for i in occupied if i >= bucket]
            low_free = [
                i for i, f in enumerate(self._slot_futures[:bucket]) if f is None
            ]
            for src, dst in zip(sorted(high, reverse=True), low_free):
                self._state = self._move(
                    self._state, jnp.int32(src), jnp.int32(dst)
                )
                self._slot_futures[dst] = self._slot_futures[src]
                self._slot_futures[src] = None
        self._step_dispatches += 1
        self._occupied_slot_steps += len(occupied)
        self._dispatched_slot_steps += bucket
        # Snapshot the harvest inputs (post-compaction, pre-step): after
        # this call the state buffers are donated to the step program. The
        # future list is snapshotted BY IDENTITY alongside: a request
        # inserted into a freed slot after this snapshot must not be
        # harvested against it (the slot reads inactive with the PREVIOUS
        # occupant's tokens — a stale-result race the disaggregated loop
        # hit, where inserts run before harvest).
        self._pending_harvest = (
            jnp.copy(self._state.active),
            jnp.copy(self._state.tokens),
            list(self._slot_futures),
        )
        return self._step_bucket(self.engine.assets.params, self._state, bucket)

    def _run_prefill(self, group: List[_Request]):
        """One fixed-shape prefill dispatch for ≤prefill_batch requests,
        on the encode device when disaggregated."""
        import jax
        import jax.numpy as jnp

        samples = np.zeros((self.prefill_batch, N_SAMPLES), np.float32)
        for i, r in enumerate(group):
            n = min(len(r.samples), N_SAMPLES)
            samples[i, :n] = r.samples[:n]
        x = jnp.asarray(samples)
        if self._encode_device is not None:
            x = jax.device_put(x, self._encode_device)
        return self._prefill(self._encode_params, x, self._encode_filters)

    def _free_slots(self) -> List[int]:
        return [i for i, f in enumerate(self._slot_futures) if f is None]

    def _harvest(self) -> None:
        """Resolve futures of slots that stopped decoding; free their slots.

        Reads the snapshot taken at the LAST dispatch (lag-1): a slot that
        went inactive at step t is frozen by the active mask from then on,
        so its tokens are stable whenever read; detection costs one extra
        macro-step of slot-idle latency, and the fetch overlaps the step
        in flight instead of syncing on it."""
        if self._pending_harvest is None:
            return
        snap_active, snap_tokens, snap_futs = self._pending_harvest
        active = np.asarray(snap_active)
        done = [
            i for i, f in enumerate(self._slot_futures)
            if f is not None and snap_futs[i] is f and not active[i]
        ]
        if not done:
            return
        tokens = np.asarray(snap_tokens)
        from whisper_tpu.decode.continuous import harvest_lengths

        lengths = np.asarray(
            harvest_lengths(tokens, self._p_len, self._eot)
        )
        for i in done:
            fut = self._slot_futures[i]
            self._slot_futures[i] = None
            try:
                fut.set_result(
                    self.engine.result_from_tokens(
                        tokens[i], int(lengths[i]), self.omit_special_tokens
                    )
                )
            except Exception as e:  # noqa: BLE001
                if not fut.done():
                    fut.set_exception(e)

    # --- public API --------------------------------------------------------
    def submit(self, samples: np.ndarray) -> Future:
        if self._closed:
            raise RuntimeError("transcriber is closed")
        fut: Future = Future()
        self._queue.put(_Request(np.asarray(samples, np.float32), fut))
        return fut

    def transcribe(self, samples: np.ndarray) -> TranscriptionResult:
        return self.submit(samples).result()

    def close(self, wait: bool = True) -> None:
        raise NotImplementedError

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ContinuousTranscriber(_ContinuousBase):
    """Continuous-batching serving front-end (decode/continuous.py).

    Where :class:`AsyncTranscriber` runs whole batches in lock-step (a batch
    is as slow as its slowest decode, and arrivals wait for the batch to
    drain), this keeps a fixed pool of decode *slots* advancing every step:
    a finished slot is harvested and refilled while its neighbors keep
    decoding. Throughput under mixed decode lengths approaches
    active-slots × tokens/s instead of being gated by stragglers.

    Greedy decode only (beam hypotheses would multiply the slot axis);
    suppress/timestamp rules and language autodetection are supported —
    results are token-identical to ``engine.transcribe`` for every
    utterance regardless of arrival order or slot reuse when the engine
    and pool decode the same audio window, i.e. ``audio_ctx`` None or an
    int (pinned by tests/test_continuous.py). Under the default
    ``audio_ctx="auto"`` the slot pool always runs the FULL window (its
    slot geometry is fixed at pool creation — no per-batch content to
    derive a crop from), while ``engine.transcribe`` crops short audio:
    a documented numeric-deviation pair, same class as the crop itself
    (PARITY.md).

    Choosing a front-end (r5 A/B, benchmarks/serving_r05.json): the slot
    pool is DISPATCH-COUNT-bound — each macro-step/prefill/insert is a host
    round trip — so on a high-RTT link (the tunneled dev chip: ~25 ms)
    :class:`AsyncTranscriber` wins decisively. On directly-attached chips
    (the RTT≈0 CPU control), :class:`DisaggregatedTranscriber` beats
    lock-step async under decode-length variance (117.8 vs 109.9 audio-s/s
    at 55% length cv) while THIS class — prefill inline with the decode
    loop — still trails ~20%; prefer Disaggregated when using a slot pool.
    Call :meth:`warmup` at startup: bucket step programs otherwise compile
    lazily inside the serving loop.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def close(self, wait: bool = True) -> None:
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            if wait:
                self._thread.join()

    # --- worker ------------------------------------------------------------
    def _admit(self, requests: List[_Request]) -> List[_Request]:
        """Prefill utterances in fixed-size groups (one compiled prefill
        program) and insert them into free slots while any remain. Returns
        the requests that did not fit (stay pending)."""
        import jax.numpy as jnp

        while requests:
            free = self._free_slots()
            if not free:
                break
            group = requests[: min(len(free), self.prefill_batch)]
            requests = requests[len(group):]
            try:
                pack = self._run_prefill(group)
                for i, r in enumerate(group):
                    slot = free[i]
                    self._state = self._insert(
                        self._state, jnp.int32(slot), pack, i
                    )
                    self._slot_futures[slot] = r.future
            except Exception as e:  # noqa: BLE001 — per-group error isolation
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)
        return requests

    def _worker(self) -> None:
        # HARVEST RUNS LAG-1 (r5, VERDICT r4 next-#6): the r4 loop was
        # dispatch → harvest, and _harvest's np.asarray(state.active) is a
        # hard sync on the step JUST dispatched — every macro-step became a
        # blocking round trip (cProfile: 50% of continuous wall in that
        # fetch on the CPU backend, where RTT is zero). Harvesting BEFORE
        # the next dispatch reads the PREVIOUS step's state, whose result
        # resolved while the host was admitting/dispatching — the sync
        # overlaps device work. Lag-1 is safe: a slot that went inactive at
        # step t is frozen by the active mask from then on, so its tokens
        # are stable whenever they are read; it costs one macro-step of
        # slot-idle latency per finish.
        pending: List[_Request] = []
        while True:
            idle = not pending and all(f is None for f in self._slot_futures)
            try:
                req = self._queue.get(block=idle, timeout=None if not idle else 0.25)
                if req is None:
                    # Drain: finish everything already admitted or pending.
                    while pending or any(
                        f is not None for f in self._slot_futures
                    ):
                        self._harvest()
                        pending = self._admit(pending)
                        if any(f is not None for f in self._slot_futures):
                            self._state = self._dispatch_step()
                    return
                pending.append(req)
                # Opportunistically drain the queue without blocking.
                while True:
                    try:
                        nxt = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if nxt is None:
                        self._queue.put(None)  # re-post sentinel, drain first
                        break
                    pending.append(nxt)
            except queue.Empty:
                pass
            self._harvest()
            if pending:
                pending = self._admit(pending)
            if any(f is not None for f in self._slot_futures):
                self._state = self._dispatch_step()


class DisaggregatedTranscriber(_ContinuousBase):
    """Disaggregated encode→decode serving: prefill (mel → encoder →
    cross-KV + prompt pass) and the continuous decode loop run on SEPARATE
    host threads, with independently chosen batch sizes — ``prefill_batch``
    utterances per encode dispatch feeding ``n_slots`` decode slots. This is
    the rationale the EncDec split exists for ("encoder batch ≠ decoder
    batch", engine/engine.py; reference whisper.cpp:740-776 runs the two
    Atoms strictly back-to-back).

    Compared to :class:`ContinuousTranscriber`, whose single worker stalls
    the whole slot pool for the duration of every prefill it admits, the
    decode thread here never waits on encode: JAX dispatch is async, so both
    threads keep the device queue fed and the next group's encode overlaps
    the current slots' decode steps. With ``encode_device`` set, prefill runs
    on its own chip (encoder params replicated there once) and finished packs
    hop devices at insert — true two-stage pipeline parallelism.

    Token-identical to ``engine.transcribe`` per utterance (same prefill
    program, same step rule — pinned by tests/test_continuous.py); the
    throughput comparison lives in tools/bench_serving.py.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # Ready queue: prefilled packs waiting for free slots, in arrival
        # order. Bounded so encode cannot run unboundedly ahead of decode
        # (each pack pins prefill_batch × (cache + cross-KV) of device HBM).
        self._ready: "queue.Queue" = queue.Queue(maxsize=4)
        self._enc_thread = threading.Thread(
            target=self._encode_worker, daemon=True
        )
        self._dec_thread = threading.Thread(
            target=self._decode_worker, daemon=True
        )
        self._enc_thread.start()
        self._dec_thread.start()

    def close(self, wait: bool = True) -> None:
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            if wait:
                self._enc_thread.join()
                self._dec_thread.join()

    # --- encode side --------------------------------------------------------
    def _encode_worker(self) -> None:
        """Batch arrivals into fixed-size prefill groups; push packs."""
        while True:
            req = self._queue.get()
            if req is None:
                self._ready.put(None)  # decode thread drains then exits
                return
            group = [req]
            # Fill the group opportunistically (encode shape is static, so a
            # partial group costs the same dispatch).
            while len(group) < self.prefill_batch:
                try:
                    nxt = self._queue.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._queue.put(None)  # re-post; current group first
                    break
                group.append(nxt)
            try:
                pack = self._run_prefill(group)
            except Exception as e:  # noqa: BLE001 — per-group isolation
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)
                continue
            self._ready.put((group, pack))

    # --- decode side --------------------------------------------------------
    def _insert_ready(self, block: bool, timeout: Optional[float]) -> bool:
        """Move prefilled utterances into free slots. Returns False once the
        encode side has signalled shutdown and everything is inserted."""
        import jax
        import jax.numpy as jnp

        while True:
            if self._pending_pack is None:
                try:
                    item = self._ready.get(block=block, timeout=timeout)
                except queue.Empty:
                    return True
                if item is None:
                    return False  # encode side done
                group, pack = item
                if self._encode_device is not None:
                    # Pack hops from the encode chip to the decode chip here
                    # — the pipeline's one inter-stage transfer.
                    pack = jax.device_put(pack, self._decode_device)
                self._pending_pack = (group, pack, 0)
                block = False  # only block for the first item
            group, pack, row = self._pending_pack
            free = self._free_slots()
            if not free:
                return True  # slots full; retry after stepping/harvesting
            while row < len(group) and free:
                slot = free.pop(0)
                self._state = self._insert(
                    self._state, jnp.int32(slot), pack, row
                )
                self._slot_futures[slot] = group[row].future
                row += 1
            if row < len(group):
                self._pending_pack = (group, pack, row)
                return True
            self._pending_pack = None

    def _decode_worker(self) -> None:
        import jax

        self._pending_pack = None
        self._decode_device = jax.devices()[0]
        draining = False
        while True:
            busy = any(f is not None for f in self._slot_futures) or (
                self._pending_pack is not None
            )
            if not draining:
                # Idle → block for work; busy → poll without blocking.
                alive = self._insert_ready(block=not busy, timeout=0.25)
                if not alive:
                    draining = True
            else:
                # Keep refilling freed slots from the pending pack while the
                # pool drains.
                self._insert_ready(block=False, timeout=None)
            if draining and self._pending_pack is None and all(
                f is None for f in self._slot_futures
            ):
                return
            # Harvest BEFORE dispatch (lag-1 snapshot — see _harvest).
            self._harvest()
            if any(f is not None for f in self._slot_futures):
                self._state = self._dispatch_step()


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
