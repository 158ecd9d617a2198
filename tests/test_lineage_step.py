"""Differential tests for the lineage decode step (models/decoder.py
decoder_step_lineage): the beam permutation virtualized into a mask over
slot-stationary cache rows.

The lineage step must be EXACTLY the eager path's math: the dense
over-slots attention adds only entries whose softmax weight is 0.0 in f32
(bias -1e30 underflows exp to zero), so logits differ by float reduction
order only — far below selection ties on random dev-model logits.

Reference match: the decode hot loop the reference re-runs O(n^2) through
its interpreter (whisper.cpp:363-399); beam search itself is net-new
capability (SURVEY.md §2b beam parallelism).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.decode.beam import beam_decode, reorder_cache, resolve_fused
from whisper_tpu.models.decoder import (
    decoder_prefill,
    decoder_step,
    decoder_step_lineage,
    grow_lineage,
    init_kv_cache,
    init_lineage,
    precompute_cross_kv,
)
from whisper_tpu.models.params import init_params


class TestLineageStep:
    """decoder_step_lineage ≡ reorder_cache ∘ decoder_step over several
    steps with real beam-style permutations (incl. duplicated parents)."""

    @pytest.mark.parametrize("kv_dtype", [None, jnp.float16])
    def test_step_differential(self, kv_dtype):
        dims = MODEL_DIMS["dev"]
        b, k, p_len, total = 2, 3, 3, 12
        bk = b * k
        params = init_params(dims, jax.random.PRNGKey(0))
        enc = jax.random.normal(
            jax.random.PRNGKey(1), (b, dims.n_audio_ctx, dims.n_audio_state)
        )
        ckv = precompute_cross_kv(params, enc, dims, kv_dtype=kv_dtype)
        prompt = jnp.tile(jnp.array([[1, 2, 3]], jnp.int32), (b, 1))
        cache_b = init_kv_cache(dims, b, total, dtype=kv_dtype or jnp.float32)
        _, cache_b = decoder_prefill(params, prompt, cache_b, ckv, dims)
        cache_e = {n: jnp.repeat(v, k, axis=1) for n, v in cache_b.items()}
        cache_l = dict(cache_e)
        lineage = init_lineage(b, k, total, p_len)

        rng = np.random.RandomState(42)
        tol = 1e-4 if kv_dtype is None else 2e-2
        for pos in range(p_len, p_len + 6):
            tok = jnp.asarray(rng.randint(0, dims.n_vocab, bk), jnp.int32)
            le, cache_e = decoder_step(
                params, tok, jnp.int32(pos), cache_e, ckv, dims, beam_width=k
            )
            ll, cache_l, lineage = decoder_step_lineage(
                params, tok, jnp.int32(pos), cache_l, lineage, ckv, dims,
                beam_width=k,
            )
            np.testing.assert_allclose(
                np.asarray(le), np.asarray(ll), atol=tol, rtol=tol,
                err_msg=f"step at pos {pos}",
            )
            # Beam-style permutation: within-batch, parents may duplicate.
            perm = np.concatenate(
                [rng.randint(0, k, k) + i * k for i in range(b)]
            ).astype(np.int32)
            cache_e = reorder_cache(cache_e, jnp.asarray(perm), bk)
            lineage = jnp.take(lineage, jnp.asarray(perm), axis=0)

    def test_lineage_growth(self):
        """grow_lineage pads with -1 (unwritten: matches no slot)."""
        lin = init_lineage(2, 3, 4, 2)
        grown = grow_lineage(lin, 7)
        assert grown.shape == (6, 7)
        np.testing.assert_array_equal(
            np.asarray(grown[:, 4:]), np.full((6, 3), -1)
        )
        np.testing.assert_array_equal(np.asarray(grown[:, :4]), np.asarray(lin))


class TestLineageBeamDecode:
    """Full beam_decode with the lineage step ≡ the eager XLA path."""

    @pytest.mark.parametrize("ctx_bucket", [None, 8])
    def test_token_parity(self, ctx_bucket):
        dims = MODEL_DIMS["dev"]
        b, beam, max_new = 2, 3, 13
        key = jax.random.PRNGKey(3)
        params = init_params(dims, key)
        enc = 0.3 * jax.random.normal(
            key, (b, dims.n_audio_ctx, dims.n_audio_state)
        )
        prompt = jnp.tile(jnp.array([[7, 11]], jnp.int32), (b, 1))
        kw = dict(
            dims=dims, eot=5, max_new_tokens=max_new, beam_size=beam,
            ctx_bucket=ctx_bucket,
        )
        ref = beam_decode(params, enc, prompt, fused=False, **kw)
        lin = beam_decode(params, enc, prompt, fused="lineage", **kw)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(lin[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(lin[1]))
        np.testing.assert_allclose(
            np.asarray(ref[2]), np.asarray(lin[2]), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.slow
    def test_token_parity_fp16_cache_multiseed(self):
        """Sub-f32 KV storage + several seeds + segment growth: the
        round-trip through the storage dtype is identical on both paths
        (both write through the cache dtype before any read)."""
        dims = MODEL_DIMS["dev"]
        for seed in range(3):
            b, beam, max_new = 3, 3, 24
            params = init_params(dims, jax.random.PRNGKey(seed))
            enc = 0.3 * jax.random.normal(
                jax.random.PRNGKey(seed + 50),
                (b, dims.n_audio_ctx, dims.n_audio_state),
            )
            prompt = jnp.tile(jnp.array([[7, 11]], jnp.int32), (b, 1))
            kw = dict(
                dims=dims, eot=5, max_new_tokens=max_new, beam_size=beam,
                ctx_bucket=8, kv_cache_dtype=jnp.float16,
            )
            ref = beam_decode(params, enc, prompt, fused=False, **kw)
            lin = beam_decode(params, enc, prompt, fused="lineage", **kw)
            np.testing.assert_array_equal(
                np.asarray(ref[0]), np.asarray(lin[0]), err_msg=f"seed {seed}"
            )
            np.testing.assert_array_equal(
                np.asarray(ref[1]), np.asarray(lin[1]), err_msg=f"seed {seed}"
            )


class TestResolveFused:
    def test_modes(self):
        dims = MODEL_DIMS["dev"]
        assert resolve_fused(False, dims) == "off"
        assert resolve_fused("off", dims) == "off"
        assert resolve_fused("lineage", dims) == "lineage"
        # On CPU (the test backend) "auto" stays eager so differential
        # tests compare distinct formulations; on TPU it is "hybrid"
        # (lineage measured 3x slower there — see resolve_fused docstring).
        expected = "hybrid" if jax.default_backend() == "tpu" else "off"
        assert resolve_fused("auto", dims) == expected
