"""Differential tests for the fused gather+append+attend decode-step kernel
(ops/fused_step.py) against its XLA oracle and the standard decoder step.

Runs the Pallas kernel in interpret mode on the CPU test platform; the TPU
path compiles the same kernel (tile alignment is the only difference, and
real-model head dims are lane-aligned)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.models.decoder import (
    decoder_prefill,
    decoder_step,
    decoder_step_fused,
    init_kv_cache,
    plane_cache_from_prefill,
    precompute_cross_kv,
)
from whisper_tpu.decode.beam import reorder_cache
from whisper_tpu.models.params import init_params
from whisper_tpu.ops.fused_step import (
    fused_gather_attend,
    reference_gather_attend,
)


def _mk(bk, ctx, n_head, dh, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    hd = n_head * dh
    shape = (2, 3, bk, ctx, hd)
    ck = jax.random.normal(ks[0], shape, jnp.float32).astype(dtype)
    cv = jax.random.normal(ks[1], shape, jnp.float32).astype(dtype)
    q = jax.random.normal(ks[2], (bk, hd), jnp.float32)
    kn = jax.random.normal(ks[3], (bk, hd), jnp.float32)
    vn = jax.random.normal(ks[4], (bk, hd), jnp.float32)
    idx = jax.random.randint(ks[5], (bk,), 0, bk, jnp.int32)
    return ck, cv, q, kn, vn, idx


class TestFusedKernel:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("parity", [0, 1])
    def test_matches_oracle(self, dtype, parity):
        bk, ctx, n_head, dh = 8, 32, 4, 16
        ck, cv, q, kn, vn, idx = _mk(bk, ctx, n_head, dh, dtype)
        q = q.astype(dtype)
        pos = jnp.int32(9)
        args = (ck, cv, idx, jnp.int32(1), pos, jnp.int32(parity), q, kn, vn)
        attn, ok, ov = fused_gather_attend(
            *args, n_head=n_head, interpret=True
        )
        ref_attn, rk, rv = reference_gather_attend(*args, n_head=n_head)
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        np.testing.assert_allclose(
            np.asarray(attn, np.float32), np.asarray(ref_attn, np.float32),
            atol=tol, rtol=tol,
        )
        # Write plane: rows 0..pos must match exactly (byte copies + append).
        dst = 1 - parity
        np.testing.assert_array_equal(
            np.asarray(ok[dst, 1, :, : 10]), np.asarray(rk[dst, 1, :, : 10])
        )
        np.testing.assert_array_equal(
            np.asarray(ov[dst, 1, :, : 10]), np.asarray(rv[dst, 1, :, : 10])
        )
        # Read plane untouched.
        np.testing.assert_array_equal(
            np.asarray(ok[parity]), np.asarray(ck[parity])
        )

    def test_duplicate_and_identity_indices(self):
        bk, ctx, n_head, dh = 6, 16, 2, 8
        ck, cv, q, kn, vn, _ = _mk(bk, ctx, n_head, dh, jnp.float32)
        for idx in (
            jnp.zeros((bk,), jnp.int32),  # all beams branch from row 0
            jnp.arange(bk, dtype=jnp.int32),  # identity (greedy case)
        ):
            args = (ck, cv, idx, jnp.int32(0), jnp.int32(3), jnp.int32(0),
                    q, kn, vn)
            attn, ok, ov = fused_gather_attend(
                *args, n_head=n_head, interpret=True
            )
            ref_attn, rk, rv = reference_gather_attend(*args, n_head=n_head)
            np.testing.assert_allclose(
                np.asarray(attn), np.asarray(ref_attn), atol=1e-5, rtol=1e-5
            )
            np.testing.assert_array_equal(
                np.asarray(ok[1, 0, :, :4]), np.asarray(rk[1, 0, :, :4])
            )

    def test_fp8_storage_roundtrip(self):
        """fp8 cache rows must move as raw bytes (no conversion) and the
        appended row must round-trip through fp8 exactly like the XLA path."""
        fp8 = jnp.float8_e4m3fn
        bk, ctx, n_head, dh = 4, 16, 2, 8
        ck, cv, q, kn, vn, idx = _mk(bk, ctx, n_head, dh, fp8)
        q = q.astype(jnp.bfloat16)
        args = (ck, cv, idx, jnp.int32(2), jnp.int32(5), jnp.int32(0),
                q, kn, vn)
        attn, ok, ov = fused_gather_attend(*args, n_head=n_head, interpret=True)
        ref_attn, rk, rv = reference_gather_attend(*args, n_head=n_head)
        np.testing.assert_array_equal(
            np.asarray(ok[1, 2, :, :6]).view(np.uint8),
            np.asarray(rk[1, 2, :, :6]).view(np.uint8),
        )
        np.testing.assert_allclose(
            np.asarray(attn, np.float32), np.asarray(ref_attn, np.float32),
            atol=5e-2, rtol=5e-2,
        )


class TestFusedBeamDecode:
    """Full beam_decode with the fused step ≡ the eager XLA path: identical
    tokens, lengths, and scores on the dev model in f32 (where the kernel's
    only numeric delta is float reduction order — far below selection ties
    on random logits)."""

    @pytest.mark.parametrize("ctx_bucket", [None, 8])
    def test_token_parity(self, ctx_bucket):
        from whisper_tpu.decode.beam import beam_decode

        dims = MODEL_DIMS["dev"]
        b, beam, p_len, max_new = 2, 3, 2, 13
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
        fus = beam_decode(params, enc, prompt, fused=True, **kw)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fus[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(fus[1]))
        np.testing.assert_allclose(
            np.asarray(ref[2]), np.asarray(fus[2]), rtol=1e-4, atol=1e-4
        )


class TestFusedDecoderStep:
    """decoder_step_fused ≡ reorder_cache ∘ decoder_step over several steps
    with real beam-style permutations, on the dev model."""

    @pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.bfloat16])
    def test_multi_step_parity(self, kv_dtype):
        dims = MODEL_DIMS["dev"]
        b, beam, p_len, ctx = 2, 2, 3, 16
        bk = b * beam
        key = jax.random.PRNGKey(0)
        params = init_params(dims, key)
        enc = jax.random.normal(key, (b, dims.n_audio_ctx, dims.n_audio_state))
        cross = precompute_cross_kv(params, enc, dims)
        prompt = jnp.tile(
            jnp.arange(p_len, dtype=jnp.int32)[None], (b, 1)
        )
        cache = init_kv_cache(dims, b, ctx, dtype=kv_dtype)
        logits, cache = decoder_prefill(params, prompt, cache, cross, dims)

        # Reference: eager reorder then step. Fused: pending permutation.
        ref_cache = {
            n: jnp.repeat(v, beam, axis=1) for n, v in cache.items()
        }
        planes = plane_cache_from_prefill(cache, beam)
        pending = jnp.arange(bk, dtype=jnp.int32)
        parity = jnp.int32(0)

        rng = np.random.default_rng(1)
        tok = jnp.array(rng.integers(0, 100, bk), jnp.int32)
        perms = [
            jnp.arange(bk, dtype=jnp.int32),
            jnp.array([1, 0, 3, 3], jnp.int32),
            jnp.array([0, 0, 2, 3], jnp.int32),
        ]
        for step, perm in enumerate(perms):
            pos = jnp.int32(p_len + step)
            # reference path: apply previous permutation eagerly, then step
            ref_cache = reorder_cache(ref_cache, pending, bk)
            ref_logits, ref_cache = decoder_step(
                params, tok, pos, ref_cache, cross, dims, beam_width=beam
            )
            fus_logits, planes = decoder_step_fused(
                params, tok, pos, planes, parity, pending, cross, dims,
                beam_width=beam, interpret=True,
            )
            tol = 2e-4 if kv_dtype == jnp.float32 else 5e-2
            np.testing.assert_allclose(
                np.asarray(fus_logits), np.asarray(ref_logits),
                atol=tol, rtol=tol,
            )
            parity = 1 - parity
            pending = perm
            tok = jnp.array(rng.integers(0, 100, bk), jnp.int32)


class TestPermuteAppend:
    """The production DMA kernel (ops/fused_step.py permute_append): write
    plane = gathered read plane + new rows at pos, byte-exact."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float8_e4m3fn])
    @pytest.mark.parametrize("parity", [0, 1])
    def test_byte_exact(self, dtype, parity):
        from whisper_tpu.ops.fused_step import permute_append

        bk, ctx, hd, L = 8, 32, 64, 3
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        ck = jax.random.normal(ks[0], (2, L, bk, ctx, hd), jnp.float32).astype(dtype)
        cv = jax.random.normal(ks[1], (2, L, bk, ctx, hd), jnp.float32).astype(dtype)
        kn = jax.random.normal(ks[2], (bk, hd), jnp.float32)
        vn = jax.random.normal(ks[3], (bk, hd), jnp.float32)
        idx = jnp.array([3, 3, 0, 5, 7, 1, 1, 4], jnp.int32)
        layer, pos = jnp.int32(1), jnp.int32(9)
        ok, ov = permute_append(
            ck, cv, idx, layer, pos, jnp.int32(parity), kn, vn,
            interpret=True,
        )
        exp_k = np.asarray(ck[parity, 1])[np.asarray(idx)]
        exp_k[:, 9, :] = np.asarray(kn.astype(dtype))
        got = np.asarray(ok[1 - parity, 1])
        np.testing.assert_array_equal(
            got.view(np.uint8), exp_k.view(np.uint8)
        )
        # read plane and other layers untouched
        np.testing.assert_array_equal(
            np.asarray(ok[parity]).view(np.uint8),
            np.asarray(ck[parity]).view(np.uint8),
        )
        exp_v = np.asarray(cv[parity, 1])[np.asarray(idx)]
        exp_v[:, 9, :] = np.asarray(vn.astype(dtype))
        np.testing.assert_array_equal(
            np.asarray(ov[1 - parity, 1]).view(np.uint8), exp_v.view(np.uint8)
        )


class TestShardedHybrid:
    """The hybrid step under a device mesh (VERDICT r4 weak#2): the Pallas
    permute kernel runs per-shard via shard_map with the [B*K] axis on the
    data axis (ops/fused_step.py permute_append_sharded), token-identical
    to the single-device eager path; tensor parallelism is refused."""

    def test_permute_append_sharded_byte_exact(self):
        from jax.sharding import Mesh

        from whisper_tpu.ops.fused_step import (
            permute_append,
            permute_append_sharded,
        )

        beam, b, ctx, hd, L = 2, 4, 16, 128, 2
        bk = b * beam
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        ck = jax.random.normal(ks[0], (2, L, bk, ctx, hd), jnp.float32)
        cv = jax.random.normal(ks[1], (2, L, bk, ctx, hd), jnp.float32)
        kn = jax.random.normal(ks[2], (bk, hd), jnp.float32)
        vn = jax.random.normal(ks[3], (bk, hd), jnp.float32)
        # Within-sample permutation (the only shape beam selection emits).
        idx = jnp.array([1, 1, 2, 3, 5, 4, 7, 7], jnp.int32)
        args = (ck, cv, idx, jnp.int32(1), jnp.int32(5), jnp.int32(0), kn, vn)
        ref_k, ref_v = permute_append(*args, interpret=True)
        mesh = Mesh(
            np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model")
        )
        got_k, got_v = permute_append_sharded(
            *args, mesh=mesh, data_axis="data", beam=beam, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))

    def test_beam_decode_dp_mesh_token_parity(self):
        from jax.sharding import Mesh

        from whisper_tpu.decode.beam import beam_decode

        dims = MODEL_DIMS["dev"]
        b, beam, p_len, max_new = 4, 3, 2, 9
        key = jax.random.PRNGKey(3)
        params = init_params(dims, key)
        enc = 0.3 * jax.random.normal(
            key, (b, dims.n_audio_ctx, dims.n_audio_state)
        )
        prompt = jnp.tile(jnp.array([[7, 11]], jnp.int32), (b, 1))
        kw = dict(dims=dims, eot=5, max_new_tokens=max_new, beam_size=beam)
        ref = beam_decode(params, enc, prompt, fused=False, **kw)
        mesh = Mesh(
            np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model")
        )
        fus = beam_decode(
            params, enc, prompt, fused=True, mesh=mesh, **kw
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fus[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(fus[1]))

    def test_tp_mesh_refuses_hybrid(self):
        from whisper_tpu.decode.beam import resolve_fused

        dims = MODEL_DIMS["dev"]
        with pytest.raises(ValueError, match="tensor-parallel"):
            resolve_fused("hybrid", dims, tp=2)
        # "auto" and legacy True degrade silently to the eager step.
        assert resolve_fused("auto", dims, tp=2) == "off"
        assert resolve_fused(True, dims, tp=2) == "off"
        # lineage/off are tp-agnostic.
        assert resolve_fused("lineage", dims, tp=2) == "lineage"
        assert resolve_fused("off", dims, tp=2) == "off"
