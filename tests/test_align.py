"""Word-level timestamp alignment (decode/align.py): DTW correctness on
hand-built matrices, z-norm/averaging vs a numpy oracle, word grouping on
byte surfaces, and the engine end-to-end path on the dev model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import MODEL_DIMS, EngineConfig
from whisper_tpu.decode.align import (
    SECONDS_PER_POSITION,
    Word,
    alignment_matrix,
    default_alignment_mask,
    dtw_path,
    heads_to_mask,
    median_filter,
    split_words,
    token_boundaries,
    words_from_alignment,
)
from whisper_tpu.engine import EngineType, create_engine


class TestDTW:
    def test_diagonal_path(self):
        # Strong negative diagonal → path follows it exactly.
        n = 6
        cost = np.ones((n, n)) - 2.0 * np.eye(n)
        ti, fi = dtw_path(cost)
        on_diag = set(zip(ti.tolist(), fi.tolist()))
        assert all((i, i) in on_diag for i in range(n))

    def test_monotonic_and_covering(self):
        rng = np.random.default_rng(0)
        cost = rng.standard_normal((5, 40))
        ti, fi = dtw_path(cost)
        assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
        assert set(ti.tolist()) == set(range(5))
        assert fi[0] == 0 and fi[-1] == 39
        # steps move by at most 1 in each axis
        assert (np.diff(ti) <= 1).all() and (np.diff(fi) <= 1).all()

    def test_known_two_segment_alignment(self):
        # Token 0 matches frames 0-4, token 1 matches frames 5-9.
        m = np.zeros((2, 10))
        m[0, :5] = 5.0
        m[1, 5:] = 5.0
        ti, fi = dtw_path(-m)
        bounds = token_boundaries(ti, fi, 2)
        assert bounds[0, 0] == 0 and bounds[0, 1] == 5
        assert bounds[1, 1] == 10
        assert bounds[1, 0] >= 4


class TestMedianFilter:
    def test_matches_naive(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 20))
        got = median_filter(x, 5)
        padded = np.pad(x, [(0, 0), (2, 2)], mode="reflect")
        want = np.stack(
            [
                np.median(padded[:, j : j + 5], axis=1)
                for j in range(20)
            ],
            axis=1,
        )
        np.testing.assert_allclose(got, want)

    def test_width_one_identity(self):
        x = np.arange(12.0).reshape(3, 4)
        np.testing.assert_array_equal(median_filter(x, 1), x)


class TestMasks:
    def test_default_mask_upper_half(self):
        dims = MODEL_DIMS["dev"]
        m = default_alignment_mask(dims)
        assert m.shape == (dims.n_text_layer, dims.n_text_head)
        assert not m[: dims.n_text_layer // 2].any()
        assert m[dims.n_text_layer // 2 :].all()

    def test_heads_to_mask(self):
        dims = MODEL_DIMS["dev"]
        m = heads_to_mask([(0, 1), (1, 0)], dims)
        assert m[0, 1] and m[1, 0] and m.sum() == 2


class TestAlignmentMatrix:
    @pytest.mark.slow
    def test_masked_average_matches_oracle(self):
        """Head-mask averaging: running with a single-head mask must equal
        the z-normed weights of that head computed independently — pinned by
        comparing two single-head runs against a two-head run's average."""
        from whisper_tpu.models.decoder import precompute_cross_kv
        from whisper_tpu.models.params import init_params

        dims = MODEL_DIMS["dev"]
        params = init_params(dims, jax.random.PRNGKey(0), dtype=jnp.float32)
        b, t = 2, 7
        enc = jax.random.normal(
            jax.random.PRNGKey(1), (b, dims.n_audio_ctx, dims.n_audio_state)
        )
        cross = precompute_cross_kv(params, enc, dims)
        toks = jax.random.randint(
            jax.random.PRNGKey(2), (b, t), 0, dims.n_vocab
        ).astype(jnp.int32)

        def run(mask):
            return np.asarray(
                alignment_matrix(
                    params, toks, cross, dims, jnp.asarray(mask)
                )
            )

        m_a = heads_to_mask([(1, 0)], dims)
        m_b = heads_to_mask([(1, 1)], dims)
        m_ab = heads_to_mask([(1, 0), (1, 1)], dims)
        np.testing.assert_allclose(
            run(m_ab), (run(m_a) + run(m_b)) / 2.0, rtol=1e-4, atol=1e-5
        )

    def test_znorm_per_head(self):
        """Each head's contribution is standardized over the token axis:
        a single-head matrix has ~zero column means across tokens."""
        from whisper_tpu.models.decoder import precompute_cross_kv
        from whisper_tpu.models.params import init_params

        dims = MODEL_DIMS["dev"]
        params = init_params(dims, jax.random.PRNGKey(0), dtype=jnp.float32)
        enc = jax.random.normal(
            jax.random.PRNGKey(1), (1, dims.n_audio_ctx, dims.n_audio_state)
        )
        cross = precompute_cross_kv(params, enc, dims)
        toks = jnp.asarray([[3, 5, 9, 2, 7, 1]], jnp.int32)
        m = np.asarray(
            alignment_matrix(
                params, toks, cross, dims,
                jnp.asarray(heads_to_mask([(1, 0)], dims)),
            )
        )
        col_means = m[0].mean(axis=0)
        np.testing.assert_allclose(col_means, 0.0, atol=1e-4)


class TestWords:
    class _FakeVocab:
        class _S:
            eot = 100

        specials = _S()
        _surfaces = {1: b" Hello", 2: b" wor", 3: b"ld", 4: b"!", 5: b" x"}

        def surface(self, tid):
            return self._surfaces[tid]

    def test_split_words_on_spaces(self):
        words = split_words(self._FakeVocab(), [1, 2, 3, 4, 5])
        assert [w for w, _ in words] == ["Hello", "world!", "x"]
        assert [idx for _, idx in words] == [[0], [1, 2, 3], [4]]

    def test_specials_skipped(self):
        words = split_words(self._FakeVocab(), [1, 100, 2, 3])
        assert [w for w, _ in words] == ["Hello", "world"]

    def test_words_from_alignment_times(self):
        vocab = self._FakeVocab()
        # rows: prompt(1) + 3 text tokens; strong blocks at frames 0-9,
        # 10-19, 20-29 → word times in seconds
        matrix = np.zeros((4, 30))
        matrix[1, 0:10] = 5.0
        matrix[2, 10:20] = 5.0
        matrix[3, 20:30] = 5.0
        tokens = np.asarray([50258, 1, 2, 3], np.int64)
        words = words_from_alignment(
            vocab, tokens, length=4, p_len=1, matrix=matrix, medfilt_width=1
        )
        assert [w.word for w in words] == ["Hello", "world"]
        assert words[0].start == pytest.approx(0.0)
        assert words[0].end == pytest.approx(10 * SECONDS_PER_POSITION)
        assert words[1].end == pytest.approx(30 * SECONDS_PER_POSITION)
        assert words[0].tokens == [1] and words[1].tokens == [2, 3]

    def test_empty_generation(self):
        words = words_from_alignment(
            self._FakeVocab(), np.asarray([50258]), 1, 1, np.zeros((1, 10))
        )
        assert words == []


class TestEngineIntegration:
    def test_end_to_end_dev_model(self):
        rng = np.random.default_rng(5)
        audio = (0.1 * rng.standard_normal((2, 16_000))).astype(np.float32)
        eng = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", max_new_tokens=4,
                         dtype="float32", word_timestamps=True),
            seed=0,
        )
        results = eng.transcribe_batch(audio)
        for r in results:
            assert r.words is not None
            for w in r.words:
                assert isinstance(w, Word)
                assert 0.0 <= w.start <= w.end <= 30.0
            starts = [w.start for w in r.words]
            assert starts == sorted(starts)
        # without the flag: no words
        eng2 = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", max_new_tokens=4,
                         dtype="float32"),
            seed=0,
        )
        assert eng2.transcribe_batch(audio)[0].words is None
        # token parity: alignment must not perturb decoding
        a = [list(r.tokens) for r in results]
        b = [list(r.tokens) for r in eng2.transcribe_batch(audio)]
        assert a == b
