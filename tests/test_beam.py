"""Beam search semantics tests.

1. Unit tests of the vectorized candidate walk (beam.select_candidates) and
   fill-no-replace finished-set insertion, including forced EOT ties — the
   cases where tie-break order decides the output.
2. A differential test of the full beam_decode against a slow, dict/sorted
   reference implementation that transliterates openai-whisper's
   BeamSearchDecoder.update/finalize control flow (decoding.py), driving the
   same decoder_prefill/decoder_step primitives so logits are bit-identical
   and only the *selection semantics* are under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.decode import beam as beam_mod
from whisper_tpu.decode.beam import (
    NEG_INF,
    FinishedSet,
    _insert_finished,
    beam_decode,
    select_candidates,
)
from whisper_tpu.models.decoder import (
    decoder_prefill,
    decoder_step,
    init_kv_cache,
    precompute_cross_kv,
)
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params

EOT = 7  # small fake vocab for selection unit tests


# --- selection unit tests ----------------------------------------------------


def sel(scores, is_eot, k):
    return select_candidates(
        jnp.asarray(scores, jnp.float32), jnp.asarray(is_eot, bool), k
    )


def test_select_basic_continuations():
    # 6 candidates, no EOT: top-2 non-EOT by score.
    s = sel([[0.1, 0.9, 0.5, 0.3, 0.8, 0.2]], [[False] * 6], 2)
    assert s.act_idx.tolist() == [[1, 4]]
    assert not s.eot_valid.any()


def test_select_eot_above_cutoff_collected():
    # EOT (idx 0) outscores the 2nd continuation => eligible.
    s = sel([[0.9, 1.0, 0.5]], [[True, False, False]], 2)
    assert s.act_idx.tolist() == [[1, 2]]
    assert bool(s.eot_valid[0, 0])
    assert int(s.eot_idx[0, 0]) == 0


def test_select_eot_below_cutoff_dropped():
    # openai stops the walk after saving K continuations: an EOT sorted after
    # the K-th continuation is never collected.
    s = sel([[0.4, 1.0, 0.5]], [[True, False, False]], 2)
    assert not s.eot_valid.any()


def test_select_eot_tie_lower_index_wins():
    # EOT ties the K-th continuation exactly. Insertion order (stable sort)
    # decides: lower candidate index iterates first.
    s_low = sel([[0.5, 1.0, 0.5]], [[True, False, False]], 2)
    assert bool(s_low.eot_valid[0, 0])  # EOT idx 0 < continuation idx 2

    s_high = sel([[1.0, 0.5, 0.5]], [[False, False, True]], 2)
    assert not s_high.eot_valid.any()  # EOT idx 2 > continuation idx 1


def test_select_continuation_ties_by_index():
    s = sel([[0.5, 0.5, 0.5, 0.5]], [[False] * 4], 2)
    assert s.act_idx.tolist() == [[0, 1]]


def test_insert_finished_no_replace():
    # A full set never changes, regardless of newcomer scores.
    L = 4
    full = FinishedSet(
        tokens=jnp.zeros((1, 2, L), jnp.int32),
        scores=jnp.array([[-5.0, -6.0]]),
        lengths=jnp.array([[3, 3]], jnp.int32),
        valid=jnp.ones((1, 2), bool),
    )
    out = _insert_finished(
        full,
        jnp.ones((1, 2, L), jnp.int32),
        jnp.array([[100.0, 99.0]]),
        jnp.array([[2, 2]], jnp.int32),
        jnp.ones((1, 2), bool),
    )
    assert out.scores.tolist() == [[-5.0, -6.0]]
    assert out.valid.all()
    assert (np.asarray(out.tokens) == 0).all()


def test_insert_finished_fills_in_order():
    L = 4
    half = FinishedSet(
        tokens=jnp.full((1, 3, L), 9, jnp.int32),
        scores=jnp.array([[-5.0, NEG_INF, NEG_INF]]),
        lengths=jnp.array([[3, 0, 0]], jnp.int32),
        valid=jnp.array([[True, False, False]]),
    )
    out = _insert_finished(
        half,
        jnp.full((1, 3, L), 1, jnp.int32),
        jnp.array([[7.0, 3.0, NEG_INF]]),
        jnp.array([[2, 2, 0]], jnp.int32),
        jnp.array([[True, True, False]]),
    )
    # Existing first (arrival order), then newcomers by their order.
    assert out.scores.tolist() == [[-5.0, 7.0, 3.0]]
    assert out.valid.all()


# --- slow reference implementation (openai decoding.py control flow) --------


def _topk_stable(lp_row: np.ndarray, n: int):
    """torch.topk / lax.top_k tie behavior: score desc, then lower index."""
    order = np.lexsort((np.arange(len(lp_row)), -lp_row))[:n]
    return lp_row[order], order


def slow_beam_reference(
    params, enc_out, prompt, dims, eot, max_new, k,
    logit_bias=None, length_penalty=None,
):
    """Dict/sorted transliteration of openai BeamSearchDecoder (decoding.py):
    per-sample candidate dicts, stable sorted() walk, fill-no-replace
    finished sets, active-beam padding at finalize, ML ranking."""
    b, p_len = prompt.shape
    total_len = p_len + max_new
    cross_kv = precompute_cross_kv(params, enc_out, dims)

    results = []
    for i in range(b):
        ckv = {n: v[:, i : i + 1] for n, v in cross_kv.items()}
        cache = init_kv_cache(dims, 1, total_len)
        logits, cache = decoder_prefill(
            params, prompt[i : i + 1], cache, ckv, dims
        )
        last = np.asarray(logits[:, -1, :], np.float32)[0]
        if logit_bias is not None:
            last = last + np.asarray(logit_bias, np.float32)
        lp0 = last - (np.max(last) + np.log(np.sum(np.exp(last - np.max(last)))))

        # First update: K identical beams; the candidate dict dedups to the
        # top (K+1) tokens of one beam.
        top_lp, top_tok = _topk_stable(lp0, k + 1)
        finished: list = []  # (score, tokens, length) in arrival order
        beams: list = []  # (tokens list, sum_logprob)
        saved = 0
        for lp_c, tok in zip(top_lp, top_tok):
            seq = prompt[i].tolist() + [int(tok)]
            if int(tok) == eot:
                if len(finished) < k:
                    finished.append((float(lp_c), seq, p_len + 1))
            else:
                beams.append((seq, float(lp_c)))
                saved += 1
                if saved == k:
                    break
        # Replicate the single-row cache across the K beams.
        cache = {n: jnp.repeat(v, k, axis=1) for n, v in cache.items()}
        ckv_k = ckv  # shared; decoder_step(beam_width=k) reads batch-1 copy

        pos = p_len + 1
        while pos < total_len and len(finished) < k:
            prev = jnp.asarray([bm[0][pos - 1] for bm in beams], jnp.int32)
            logits, cache = decoder_step(
                params, prev, jnp.int32(pos - 1), cache, ckv_k, dims,
                beam_width=k,
            )
            lg = np.asarray(logits, np.float32)
            if logit_bias is not None:
                lg = lg + np.asarray(logit_bias, np.float32)
            mx = lg.max(axis=-1, keepdims=True)
            lp = lg - (mx + np.log(np.exp(lg - mx).sum(-1, keepdims=True)))

            # openai STEP 1: per-beam top (K+1) candidates, dict insertion
            # order = beam-major then rank.
            cand = []  # (score, insertion_idx, seq, src_beam, tok)
            for j, (seq_j, sum_lp) in enumerate(beams):
                t_lp, t_tok = _topk_stable(lp[j], k + 1)
                for r, (lpc, tok) in enumerate(zip(t_lp, t_tok)):
                    cand.append(
                        (sum_lp + float(lpc), j * (k + 1) + r,
                         seq_j + [int(tok)], j, int(tok))
                    )
            # openai STEP 2: stable sort by score desc; walk, break at K-th
            # continuation.
            cand.sort(key=lambda c: (-c[0], c[1]))
            new_beams, srcs, saved = [], [], 0
            for score, _, seq, src, tok in cand:
                if tok == eot:
                    if len(finished) < k:
                        finished.append((score, seq, pos + 1))
                else:
                    new_beams.append((seq, score))
                    srcs.append(src)
                    saved += 1
                    if saved == k:
                        break
            beams = new_beams
            idx = jnp.asarray(srcs, jnp.int32)
            cache = {n: jnp.take(v, idx, axis=1) for n, v in cache.items()}
            pos += 1

        # finalize: pad from actives in raw-score order (stable by beam idx).
        for j in np.lexsort(
            (np.arange(len(beams)), -np.asarray([s for _, s in beams]))
        ):
            if len(finished) >= k:
                break
            seq, score = beams[j]
            length = len(seq) + 1 if len(seq) < total_len else total_len
            finished.append((score, seq + [eot] if len(seq) < total_len else seq,
                             length))

        def norm(score, length):
            gen = max(length - p_len, 1)
            if length_penalty is None:
                return score / gen
            return score / (((5.0 + gen) / 6.0) ** length_penalty)

        best = max(
            range(len(finished)),
            key=lambda j: (norm(finished[j][0], finished[j][2]), -j),
        )
        score, seq, length = finished[best]
        row = np.full(total_len, eot, np.int32)
        row[: len(seq)] = seq
        results.append((row, length, norm(score, length)))

    tokens = np.stack([r[0] for r in results])
    lengths = np.asarray([r[1] for r in results], np.int32)
    scores = np.asarray([r[2] for r in results], np.float32)
    return tokens, lengths, scores


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("eot_boost", [0.0, 4.0])
def test_beam_differential_vs_openai_reference(seed, eot_boost):
    """beam_decode output == the dict-based openai-semantics walk, both
    driven by the identical decoder primitives (fp32, dev model). The EOT
    boost makes hypotheses actually finish so the finished-set path (not
    just active padding) is exercised."""
    dims = MODEL_DIMS["dev"]
    k, max_new, b = 3, 8, 2
    eot = 50257
    params = init_params(dims, jax.random.PRNGKey(seed), dtype=jnp.float32)
    mel = jax.random.normal(
        jax.random.PRNGKey(seed + 100), (b, dims.n_mels, 3000)
    )
    enc_out = encode(params, mel, dims)
    prompt = jnp.tile(
        jnp.asarray([[50258, 50259, 50360, 50364]], jnp.int32), (b, 1)
    )
    bias = np.zeros(dims.n_vocab, np.float32)
    bias[eot] = eot_boost
    bias = jnp.asarray(bias)

    tokens, lengths, scores = beam_decode(
        params, enc_out, prompt, dims, eot=eot, max_new_tokens=max_new,
        beam_size=k, logit_bias=bias,
    )
    ref_tokens, ref_lengths, ref_scores = slow_beam_reference(
        params, enc_out, prompt, dims, eot, max_new, k, logit_bias=bias
    )

    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    assert lengths.tolist() == ref_lengths.tolist()
    for i in range(b):
        assert tokens[i, : lengths[i]].tolist() == \
            ref_tokens[i, : ref_lengths[i]].tolist()
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)


@pytest.mark.slow
def test_beam_finished_not_evicted_by_longer_actives():
    """A hypothesis that finishes early must survive even when active beams
    keep accumulating (the round-1 frozen-beam formulation could evict it).
    With a huge EOT boost every beam finishes on the first expansion."""
    dims = MODEL_DIMS["dev"]
    eot = 50257
    params = init_params(dims, jax.random.PRNGKey(0), dtype=jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, dims.n_mels, 3000))
    enc_out = encode(params, mel, dims)
    prompt = jnp.asarray([[50258, 50259, 50360, 50364]], jnp.int32)
    bias = np.zeros(dims.n_vocab, np.float32)
    bias[eot] = 100.0
    tokens, lengths, _ = beam_decode(
        params, enc_out, prompt, dims, eot=eot, max_new_tokens=8,
        beam_size=3, logit_bias=jnp.asarray(bias),
    )
    # Best hypothesis: prompt + immediate EOT.
    assert int(lengths[0]) == prompt.shape[1] + 1
    assert int(np.asarray(tokens)[0, prompt.shape[1]]) == eot


@pytest.mark.slow
def test_beam_cross_kv_not_replicated():
    """The decode program's cross-KV operand stays at batch B (shared across
    beams) — the K-fold replication would multiply the dominant HBM stream."""
    dims = MODEL_DIMS["dev"]
    params = init_params(dims, jax.random.PRNGKey(0), dtype=jnp.float32)
    b, k = 2, 4
    enc_out = encode(
        params,
        jax.random.normal(jax.random.PRNGKey(1), (b, dims.n_mels, 3000)),
        dims,
    )
    cross = precompute_cross_kv(params, enc_out, dims)
    assert cross["k"].shape[1] == b
    prompt = jnp.tile(jnp.asarray([[50258, 50364]], jnp.int32), (b, 1))
    tokens, lengths, _ = beam_decode(
        params, enc_out, prompt, dims, eot=50257, max_new_tokens=4,
        beam_size=k, cross_kv=cross,
    )
    assert tokens.shape == (b, prompt.shape[1] + 4)


def test_topk_wide_matches_lax_topk():
    from whisper_tpu.decode.beam import topk_wide

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((7, 1000)).astype(np.float32))
    want_v, want_i = jax.lax.top_k(x, 6)
    got_v, got_i = topk_wide(x, 6)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))


def test_topk_wide_tie_order():
    from whisper_tpu.decode.beam import topk_wide

    x = jnp.asarray([[1.0, 3.0, 3.0, 3.0, 0.0]])
    _, idx = topk_wide(x, 3)
    assert idx.tolist() == [[1, 2, 3]]  # equal values: lowest index first


class TestReorderCache:
    """reorder_cache must be an EXACT permutation (bitwise) in every storage
    dtype — the int8-bitcast fast path for fp8 caches included."""

    @pytest.mark.parametrize(
        "dtype", ["float32", "bfloat16", "float8_e4m3fn", "float8_e5m2"]
    )
    def test_matches_take(self, dtype):
        from whisper_tpu.decode.beam import reorder_cache

        rng = np.random.default_rng(5)
        dt = jnp.dtype(dtype)
        bk, l, t, h, dh = 6, 2, 5, 3, 4
        cache = {
            n: jnp.asarray(
                rng.standard_normal((l, bk, t, h, dh)), jnp.float32
            ).astype(dt)
            for n in ("k", "v")
        }
        idx = jnp.asarray([3, 3, 0, 5, 1, 2], jnp.int32)  # with duplicates
        out = reorder_cache(cache, idx, bk)
        for n in ("k", "v"):
            expect = jnp.take(cache[n], idx, axis=1)
            assert out[n].dtype == dt
            np.testing.assert_array_equal(
                np.asarray(out[n]).view(np.uint8),
                np.asarray(expect).view(np.uint8),
            )


@pytest.mark.slow
class TestCtxBucketing:
    """Segment-growth decode (sequential while_loops over growing cache
    buffers — greedy.ctx_bucket_limits) must be BIT-IDENTICAL to the
    single full-size-buffer decode: unwritten positions carry exactly-zero
    softmax weight and the grow copy is value-preserving."""

    def test_beam_bucketed_parity(self):
        dims = MODEL_DIMS["dev"]
        eot = 50257
        params = init_params(dims, jax.random.PRNGKey(3), dtype=jnp.float32)
        mel = jax.random.normal(jax.random.PRNGKey(4), (2, dims.n_mels, 3000))
        enc_out = encode(params, mel, dims)
        prompt = jnp.tile(
            jnp.asarray([[50258, 50259, 50360, 50364]], jnp.int32), (2, 1)
        )
        kw = dict(dims=dims, eot=eot, max_new_tokens=9, beam_size=3)
        full = beam_decode(params, enc_out, prompt, ctx_bucket=0, **kw)
        bucketed = beam_decode(params, enc_out, prompt, ctx_bucket=4, **kw)
        np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(bucketed[0]))
        np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(bucketed[1]))
        np.testing.assert_allclose(
            np.asarray(full[2]), np.asarray(bucketed[2]), rtol=1e-6
        )

    def test_greedy_bucketed_parity(self):
        from whisper_tpu.decode.greedy import greedy_decode

        dims = MODEL_DIMS["dev"]
        eot = 50257
        params = init_params(dims, jax.random.PRNGKey(5), dtype=jnp.float32)
        mel = jax.random.normal(jax.random.PRNGKey(6), (2, dims.n_mels, 3000))
        enc_out = encode(params, mel, dims)
        prompt = jnp.tile(
            jnp.asarray([[50258, 50259, 50360, 50364]], jnp.int32), (2, 1)
        )
        kw = dict(dims=dims, eot=eot, max_new_tokens=10)
        full = greedy_decode(params, enc_out, prompt, ctx_bucket=None, **kw)
        bucketed = greedy_decode(params, enc_out, prompt, ctx_bucket=4, **kw)
        np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(bucketed[0]))
        np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(bucketed[1]))

    def test_reorder_window_matches_full(self):
        from whisper_tpu.decode.beam import reorder_cache, reorder_cache_window

        rng = np.random.default_rng(9)
        bk, l, t, h, dh = 6, 2, 8, 3, 4
        cache = {
            n: jnp.asarray(rng.standard_normal((l, bk, t, h, dh)), jnp.float32)
            for n in ("k", "v")
        }
        # zero the "unwritten" tail the window contract assumes
        cache = {n: v.at[:, :, 5:].set(0.0) for n, v in cache.items()}
        idx = jnp.asarray([2, 0, 0, 4, 5, 1], jnp.int32)
        full = reorder_cache(cache, idx, bk)
        win = reorder_cache_window(cache, idx, bk, limit=5)
        for n in ("k", "v"):
            np.testing.assert_array_equal(np.asarray(full[n]), np.asarray(win[n]))


def test_pallas_permute_rows_interpret():
    """ops/gather.py kernel logic (scalar-prefetched row DMA) on CPU via
    Pallas interpret mode: bitwise equal to jnp.take, dups included."""
    from whisper_tpu.ops.gather import permute_rows, supported

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, 5, 4, 2, 64)), jnp.float32)
    assert supported(x.shape)
    idx = jnp.asarray([4, 4, 0, 2, 1], jnp.int32)
    out = permute_rows(x, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take(x, idx, axis=1))
    )


class TestCtxBucketingCanary:
    """Fast-tier segment-growth parity guard (ADVICE r3 #4): the default
    `pytest tests/` profile excludes the slow tier, so this cheap dev-dims
    case keeps a bucketed-vs-full decode regression visible in every run.
    Skips the encoder (random enc_out) and uses a tiny budget."""

    def test_beam_bucketed_parity_fast(self):
        dims = MODEL_DIMS["dev"]
        params = init_params(dims, jax.random.PRNGKey(3), dtype=jnp.float32)
        enc_out = 0.3 * jax.random.normal(
            jax.random.PRNGKey(4), (1, dims.n_audio_ctx, dims.n_audio_state)
        )
        prompt = jnp.asarray([[50258, 50259]], jnp.int32)
        kw = dict(dims=dims, eot=50257, max_new_tokens=7, beam_size=2)
        full = beam_decode(params, enc_out, prompt, ctx_bucket=0, **kw)
        bucketed = beam_decode(params, enc_out, prompt, ctx_bucket=3, **kw)
        np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(bucketed[0]))
        np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(bucketed[1]))
