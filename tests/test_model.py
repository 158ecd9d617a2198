"""Model + decode-loop invariants.

The load-bearing test is incremental-vs-full-recompute equivalence: the
reference decoder *is* a full recompute every step (whisper.cpp:367-375), so
our KV-cached loop reproducing the recompute's tokens is exactly the parity
the reference's behavior demands (SURVEY.md §2a.13).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import MODEL_DIMS, ModelDims
from whisper_tpu.decode.greedy import argmax_last, greedy_decode
from whisper_tpu.models.decoder import (
    decoder_prefill,
    init_kv_cache,
    precompute_cross_kv,
)
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import count_params, init_params

TINY = ModelDims(
    n_mels=80,
    n_audio_ctx=30,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=100,
    n_text_ctx=24,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)
EOT = 99


@pytest.fixture(scope="module")
def params():
    return init_params(TINY, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def enc_out(params):
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, TINY.n_mels, 60))
    return encode(params, mel, TINY)


class TestEncoder:
    def test_shape_and_finite(self, enc_out):
        assert enc_out.shape == (2, 30, 64)  # conv2 stride halves frames
        assert np.isfinite(np.asarray(enc_out)).all()

    def test_batch_independence(self, params):
        mel = jax.random.normal(jax.random.PRNGKey(2), (3, TINY.n_mels, 60))
        full = np.asarray(encode(params, mel, TINY))
        one = np.asarray(encode(params, mel[1:2], TINY))
        np.testing.assert_allclose(full[1], one[0], atol=1e-5)


class TestArgmaxLast:
    def test_ties_pick_highest_index(self):
        # Reference `>=` scan semantics (whisper.cpp:346-361).
        x = jnp.array([1.0, 5.0, 3.0, 5.0, 2.0])
        assert int(argmax_last(x)) == 3
        x2 = jnp.array([[7.0, 7.0, 7.0], [0.0, 1.0, 1.0]])
        np.testing.assert_array_equal(np.asarray(argmax_last(x2)), [2, 2])

    def test_no_tie_matches_argmax(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (16, 100))
        np.testing.assert_array_equal(
            np.asarray(argmax_last(x)), np.asarray(jnp.argmax(x, axis=-1))
        )


def naive_recompute_decode(params, enc_out, prompt, max_new):
    """Reference-style O(n²) greedy: rebuild the whole sequence each step with
    a fresh cache (the cache sized to the sequence acts as plain attention)."""
    cross_kv = precompute_cross_kv(params, enc_out, TINY)
    tokens = np.asarray(prompt).tolist()
    b = len(tokens)
    finished = [False] * b
    for _ in range(max_new):
        t = len(tokens[0])
        cache = init_kv_cache(TINY, b, t)
        seq = jnp.asarray(tokens, dtype=jnp.int32)
        logits, _ = decoder_prefill(params, seq, cache, cross_kv, TINY)
        nxt = np.asarray(argmax_last(logits[:, -1, :]))
        for i in range(b):
            tok = EOT if finished[i] else int(nxt[i])
            tokens[i].append(tok)
            finished[i] = finished[i] or tok == EOT
        if all(finished):
            break
    return tokens


class TestGreedyDecode:
    @pytest.mark.slow
    def test_kv_cache_matches_full_recompute(self, params, enc_out):
        prompt = jnp.array([[1, 2], [3, 4]], dtype=jnp.int32)
        max_new = 8
        got, lengths = greedy_decode(
            params, enc_out, prompt, TINY, eot=EOT, max_new_tokens=max_new
        )
        want = naive_recompute_decode(params, enc_out, prompt, max_new)
        got = np.asarray(got)
        for i, w in enumerate(want):
            np.testing.assert_array_equal(got[i, : len(w)], w)

    @pytest.mark.slow
    def test_batched_matches_single(self, params, enc_out):
        prompt = jnp.array([[1, 2], [3, 4]], dtype=jnp.int32)
        full, _ = greedy_decode(
            params, enc_out, prompt, TINY, eot=EOT, max_new_tokens=6
        )
        for i in range(2):
            solo, _ = greedy_decode(
                params, enc_out[i : i + 1], prompt[i : i + 1], TINY,
                eot=EOT, max_new_tokens=6,
            )
            np.testing.assert_array_equal(np.asarray(full)[i], np.asarray(solo)[0])

    def test_output_includes_prompt(self, params, enc_out):
        prompt = jnp.array([[5, 6, 7], [8, 9, 10]], dtype=jnp.int32)
        toks, lengths = greedy_decode(
            params, enc_out, prompt, TINY, eot=EOT, max_new_tokens=4
        )
        np.testing.assert_array_equal(np.asarray(toks)[:, :3], np.asarray(prompt))
        assert (np.asarray(lengths) <= toks.shape[1]).all()

    def test_budget_overflow_raises(self, params, enc_out):
        prompt = jnp.zeros((1, 4), dtype=jnp.int32)
        with pytest.raises(ValueError):
            greedy_decode(
                params, enc_out[:1], prompt, TINY, eot=EOT,
                max_new_tokens=TINY.n_text_ctx,
            )

    def test_logit_bias_suppression(self, params, enc_out):
        # Suppressing every token except EOT must end decoding immediately.
        bias = np.full((TINY.n_vocab,), -1e30, dtype=np.float32)
        bias[EOT] = 0.0
        prompt = jnp.array([[1, 2]], dtype=jnp.int32)
        toks, lengths = greedy_decode(
            params, enc_out[:1], prompt, TINY, eot=EOT, max_new_tokens=5,
            logit_bias=jnp.asarray(bias),
        )
        assert int(np.asarray(toks)[0, 2]) == EOT
        assert int(lengths[0]) == 3


class TestParams:
    def test_count_tiny_real_dims(self):
        from whisper_tpu.config import MODEL_DIMS

        # eval_shape: the count needs shapes only — no init compile/alloc.
        p = jax.eval_shape(
            lambda k: init_params(MODEL_DIMS["tiny"], k), jax.random.PRNGKey(0)
        )
        n = count_params(p)
        # openai tiny ≈ 39M params (37.18M non-embedding + embeddings).
        assert 35e6 < n < 45e6

    def test_jit_decode_no_retrace(self, params, enc_out):
        # Whole greedy decode must be jittable (single compiled program).
        f = jax.jit(
            lambda p, e, pr: greedy_decode(
                p, e, pr, TINY, eot=EOT, max_new_tokens=4
            )
        )
        prompt = jnp.array([[1, 2], [3, 4]], dtype=jnp.int32)
        t1, _ = f(params, enc_out, prompt)
        t2, _ = f(params, enc_out, prompt)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


class TestMergedRead:
    """The blockdiag merged-layout cache read (models/decoder.py
    ``merged_read`` — VERDICT r4 next-#5: the hybrid beam step's read
    ported to greedy/temperature decode) ≡ the eager per-head einsum."""

    @pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.bfloat16])
    def test_step_logits_match(self, kv_dtype):
        from whisper_tpu.models.decoder import (
            decoder_prefill,
            decoder_step,
            init_kv_cache,
            precompute_cross_kv,
        )

        dims = MODEL_DIMS["dev"]
        b, p_len, ctx = 2, 3, 12
        key = jax.random.PRNGKey(0)
        params = init_params(dims, key)
        enc = jax.random.normal(key, (b, dims.n_audio_ctx, dims.n_audio_state))
        cross = precompute_cross_kv(params, enc, dims)
        prompt = jnp.tile(jnp.arange(p_len, dtype=jnp.int32)[None], (b, 1))
        cache = init_kv_cache(dims, b, ctx, dtype=kv_dtype)
        _, cache = decoder_prefill(params, prompt, cache, cross, dims)
        tok = jnp.array([5, 9], jnp.int32)
        for step in range(3):
            pos = jnp.int32(p_len + step)
            ref, cache_ref = decoder_step(
                params, tok, pos, cache, cross, dims, merged_read=False
            )
            got, cache = decoder_step(
                params, tok, pos, cache, cross, dims, merged_read=True
            )
            tol = 2e-4 if kv_dtype == jnp.float32 else 5e-2
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=tol, rtol=tol
            )
            # (Written cache rows agree only to reduction-order tolerance:
            # layer l>0's K/V derive from layer l-1's attention output.)
            np.testing.assert_allclose(
                np.asarray(cache["k"], np.float32),
                np.asarray(cache_ref["k"], np.float32),
                atol=tol, rtol=tol,
            )
            tok = jnp.array([3 + step, 7], jnp.int32)

    def test_greedy_token_parity(self):
        from whisper_tpu.decode.greedy import greedy_decode

        dims = MODEL_DIMS["dev"]
        key = jax.random.PRNGKey(4)
        params = init_params(dims, key)
        enc = 0.3 * jax.random.normal(
            key, (2, dims.n_audio_ctx, dims.n_audio_state)
        )
        prompt = jnp.tile(jnp.array([[7, 11]], jnp.int32), (2, 1))
        kw = dict(dims=dims, eot=5, max_new_tokens=10)
        ref = greedy_decode(params, enc, prompt, merged_read=False, **kw)
        got = greedy_decode(params, enc, prompt, merged_read=True, **kw)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))

    def test_per_row_positions_match(self):
        """Continuous batching's per-slot positions also support the merged
        read (per-row mask broadcast)."""
        from whisper_tpu.models.decoder import (
            decoder_prefill,
            decoder_step,
            init_kv_cache,
            precompute_cross_kv,
        )

        dims = MODEL_DIMS["dev"]
        b, p_len, ctx = 3, 2, 10
        key = jax.random.PRNGKey(1)
        params = init_params(dims, key)
        enc = jax.random.normal(key, (b, dims.n_audio_ctx, dims.n_audio_state))
        cross = precompute_cross_kv(params, enc, dims)
        prompt = jnp.tile(jnp.arange(p_len, dtype=jnp.int32)[None], (b, 1))
        cache = init_kv_cache(dims, b, ctx, dtype=jnp.float32)
        _, cache = decoder_prefill(params, prompt, cache, cross, dims)
        tok = jnp.array([5, 9, 2], jnp.int32)
        pos = jnp.array([2, 4, 3], jnp.int32)  # per-row depths
        ref, _ = decoder_step(
            params, tok, pos, cache, cross, dims, merged_read=False
        )
        got, _ = decoder_step(
            params, tok, pos, cache, cross, dims, merged_read=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
        )


class TestAsymmetricDecoderDepth:
    """Model families with decoder depth != encoder depth (large-v3-turbo:
    4 text layers; Distil-Whisper: 2) run the full engine path — the
    decoder scans are sized by n_text_layer alone."""

    def test_distil_geometry_end_to_end(self):
        import dataclasses as _dc

        from whisper_tpu.config import MODEL_DIMS, EngineConfig
        from whisper_tpu.engine import EngineType, create_engine

        # dev-scale stand-in with the distil shape: deep encoder, 1-layer
        # decoder (the real distil entries share this asymmetry).
        assert MODEL_DIMS["distil-large-v3"].n_text_layer == 2
        assert MODEL_DIMS["distil-large-v3"].n_audio_layer == 32
        dims = _dc.replace(MODEL_DIMS["dev"], n_text_layer=1)
        import whisper_tpu.config as cfg

        cfg.MODEL_DIMS["dev-distil"] = dims
        try:
            eng = create_engine(
                EngineType.MONOLITH,
                EngineConfig(model="dev-distil", language="en",
                             dtype="float32", max_new_tokens=6),
                seed=0,
            )
            rng = np.random.default_rng(0)
            res = eng.transcribe_batch(
                (0.1 * rng.standard_normal((2, 16_000))).astype(np.float32)
            )
            assert all(r.length >= 2 for r in res)
        finally:
            cfg.MODEL_DIMS.pop("dev-distil", None)
