"""Int8 weight-only quantization tests (models/quantize.py).

The reference's models are dynamic-range quantized at conversion
(export/generate.py:69); the contract here is the re-derived TPU equivalent:
per-output-channel symmetric scales, exact reconstruction bound, and
interchangeability of quantized/float pytrees through every layer function.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.config import EngineConfig, ModelDims
from whisper_tpu.decode.greedy import greedy_decode
from whisper_tpu.engine.engine import EngineType, create_engine
from whisper_tpu.models import layers
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params
from whisper_tpu.models.quantize import (
    absmax_quantize,
    dequantize_params,
    is_quantized,
    param_bytes,
    quantize_params,
    quantize_pspecs,
)
from whisper_tpu.parallel import make_mesh, param_pspecs

DIMS = ModelDims(
    n_mels=80,
    n_audio_ctx=30,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=512,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)
EOT = 511


@pytest.fixture(scope="module")
def params():
    return init_params(DIMS, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def qparams(params):
    return quantize_params(params)


class TestAbsmaxQuantize:
    def test_reconstruction_bound(self, rng):
        w = rng.normal(size=(96, 64)).astype(np.float32)
        q, s = absmax_quantize(w, (0,))
        assert q.dtype == np.int8 and s.shape == (64,)
        err = np.abs(w - q.astype(np.float32) * s[None, :])
        assert np.all(err <= s[None, :] / 2 + 1e-7)

    def test_grid_values_lossless(self, rng):
        # Weights already on an int8 grid — with the grid max (±127) present
        # in every channel so the rederived scale lands back on the grid
        # step — quantize exactly.
        ints = rng.integers(-127, 128, size=(32, 16)).astype(np.float32)
        ints[0, :] = 127.0
        w = ints * 0.013
        q, s = absmax_quantize(w, (0,))
        np.testing.assert_allclose(q.astype(np.float32) * s[None, :], w, rtol=1e-6)


class TestQuantizeParams:
    def test_structure(self, params, qparams):
        assert is_quantized(qparams) and not is_quantized(params)
        # Stacked block linears: per-layer per-output-channel scales.
        blk = qparams["decoder"]["blocks"]["attn"]["q"]
        assert blk["w_q"].dtype == jnp.int8
        assert blk["w_q"].shape == (DIMS.n_text_layer, 64, 64)
        assert blk["w_s"].shape == (DIMS.n_text_layer, 64)
        # Conv: per-c_out scales.
        conv = qparams["encoder"]["conv1"]
        assert conv["w_q"].shape == (3, DIMS.n_mels, 64)
        assert conv["w_s"].shape == (64,)
        # Embedding: per-row.
        te = qparams["decoder"]["tok_emb"]
        assert te["q"].shape == (DIMS.n_vocab, 64) and te["s"].shape == (DIMS.n_vocab,)
        # Float-kept leaves survive untouched.
        assert "g" in qparams["decoder"]["ln"]
        np.testing.assert_array_equal(
            np.asarray(qparams["decoder"]["pos_emb"]),
            np.asarray(params["decoder"]["pos_emb"]),
        )

    def test_bytes_shrink(self, params, qparams):
        # fp32 → int8 on the big leaves: comfortably under 0.35x.
        assert param_bytes(qparams) < 0.35 * param_bytes(params)

    def test_dequantize_roundtrip_bound(self, params, qparams):
        deq = dequantize_params(qparams)
        w = np.asarray(params["decoder"]["blocks"]["attn"]["q"]["w"])
        d = np.asarray(deq["decoder"]["blocks"]["attn"]["q"]["w"])
        s = np.asarray(qparams["decoder"]["blocks"]["attn"]["q"]["w_s"])
        assert np.all(np.abs(w - d) <= s[:, None, :] / 2 + 1e-7)


class TestLayerDispatch:
    def test_linear_matches_dequantized(self, rng):
        p = {"w": jnp.asarray(rng.normal(size=(64, 96)), jnp.float32),
             "b": jnp.asarray(rng.normal(size=(96,)), jnp.float32)}
        q, s = absmax_quantize(p["w"], (0,))
        pq = {"w_q": jnp.asarray(q), "w_s": jnp.asarray(s), "b": p["b"]}
        pd = {"w": jnp.asarray(np.asarray(q, np.float32) * s[None, :]), "b": p["b"]}
        x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(layers.linear(pq, x)),
            np.asarray(layers.linear(pd, x)),
            rtol=2e-5, atol=2e-5,
        )

    def test_embed_unembed(self, rng):
        te = jnp.asarray(rng.normal(size=(128, 32)), jnp.float32)
        q, s = absmax_quantize(te, (1,))
        teq = {"q": jnp.asarray(q), "s": jnp.asarray(s)}
        deq = jnp.asarray(np.asarray(q, np.float32) * s[:, None])
        toks = jnp.asarray([[3, 7, 121]], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(layers.embed(teq, toks)),
            np.asarray(layers.embed(deq, toks)),
            rtol=1e-6,
        )
        x = jnp.asarray(rng.normal(size=(1, 3, 32)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(layers.unembed(teq, x)),
            np.asarray(layers.unembed(deq, x)),
            rtol=2e-5, atol=2e-5,
        )


class TestEndToEnd:
    def test_grid_params_token_exact(self, params):
        """Snap weights onto the int8 grid: quantization becomes lossless and
        greedy tokens must match the float model bit-for-bit."""
        grid = dequantize_params(quantize_params(params))
        qgrid = quantize_params(grid)
        mel = jax.random.normal(jax.random.PRNGKey(3), (2, DIMS.n_mels, 60))
        prompt = jnp.tile(jnp.array([[1, 2]], jnp.int32), (2, 1))
        tok_f, len_f = greedy_decode(
            grid, encode(grid, mel, DIMS), prompt, DIMS, eot=EOT, max_new_tokens=8
        )
        tok_q, len_q = greedy_decode(
            qgrid, encode(qgrid, mel, DIMS), prompt, DIMS, eot=EOT, max_new_tokens=8
        )
        np.testing.assert_array_equal(np.asarray(tok_f), np.asarray(tok_q))
        np.testing.assert_array_equal(np.asarray(len_f), np.asarray(len_q))

    def test_engine_int8(self, rng):
        cfg = EngineConfig(model="dev", language="en", quantization="int8",
                           max_new_tokens=4, dtype="float32")
        eng = create_engine(EngineType.MONOLITH, cfg)
        assert is_quantized(eng.assets.params)
        samples = rng.normal(size=(8000,)).astype(np.float32) * 0.1
        res = eng.transcribe(samples)
        assert res.length > 0

    def test_unknown_quantization_rejected(self):
        with pytest.raises(ValueError):
            create_engine(
                EngineType.MONOLITH,
                EngineConfig(model="dev", language="en", quantization="int4"),
            )


class TestCheckpointRoundtrip:
    def test_npz_preserves_quantized_tree(self, qparams, tmp_path):
        from whisper_tpu.utils.checkpoint import load_params, save_params

        path = str(tmp_path / "q.npz")
        save_params(path, qparams, DIMS)
        loaded, dims = load_params(path)
        assert dims == DIMS
        assert loaded["decoder"]["blocks"]["attn"]["q"]["w_q"].dtype == np.int8
        np.testing.assert_array_equal(
            np.asarray(qparams["decoder"]["tok_emb"]["q"]),
            loaded["decoder"]["tok_emb"]["q"],
        )
        np.testing.assert_array_equal(
            np.asarray(qparams["encoder"]["conv2"]["w_s"]),
            loaded["encoder"]["conv2"]["w_s"],
        )


@pytest.mark.slow
class TestShardedQuantized:
    def test_pspec_tree_congruent_and_executes(self, params, qparams):
        specs = quantize_pspecs(param_pspecs(DIMS), qparams)
        is_p = lambda x: isinstance(x, P)
        # Congruence: placing every leaf must succeed (tree.map raises on
        # structural mismatch between params and specs).
        mesh = make_mesh((4, 2))
        placed = jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
            qparams, specs, is_leaf=is_p,
        )
        mel = jax.random.normal(jax.random.PRNGKey(5), (8, DIMS.n_mels, 60))
        prompt = jnp.tile(jnp.array([[1, 2]], jnp.int32), (8, 1))
        tok_s, _ = greedy_decode(
            placed, encode(placed, mel, DIMS), prompt, DIMS, eot=EOT, max_new_tokens=6
        )
        tok_1, _ = greedy_decode(
            qparams, encode(qparams, mel, DIMS), prompt, DIMS, eot=EOT,
            max_new_tokens=6,
        )
        np.testing.assert_array_equal(np.asarray(tok_s), np.asarray(tok_1))


class TestFp8KVCache:
    """kv_cache_dtype=float8_e4m3fn: caches store fp8, attention upcasts at
    use. Halves the dominant large-model activation block (cross-KV)."""

    def test_decode_runs_and_logits_close(self, params):
        import jax.numpy as jnp

        from whisper_tpu.models.decoder import (
            decoder_prefill,
            init_kv_cache,
            precompute_cross_kv,
        )

        mel = jax.random.normal(jax.random.PRNGKey(9), (2, DIMS.n_mels, 60))
        enc_out = encode(params, mel, DIMS)
        prompt = jnp.tile(jnp.array([[1, 2]], jnp.int32), (2, 1))

        ck_f = precompute_cross_kv(params, enc_out, DIMS)
        ck_8 = precompute_cross_kv(
            params, enc_out, DIMS, kv_dtype=jnp.float8_e4m3fn
        )
        assert ck_8["k"].dtype == jnp.float8_e4m3fn
        lo_f, _ = decoder_prefill(
            params, prompt, init_kv_cache(DIMS, 2, 8), ck_f, DIMS
        )
        lo_8, _ = decoder_prefill(
            params, prompt, init_kv_cache(DIMS, 2, 8, dtype=jnp.float8_e4m3fn),
            ck_8, DIMS,
        )
        a, b = np.asarray(lo_f), np.asarray(lo_8)
        # fp8 K/V perturbs logits but must stay strongly correlated
        corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
        assert corr > 0.98, corr

    def test_greedy_with_fp8_cache(self, params):
        import jax.numpy as jnp

        mel = jax.random.normal(jax.random.PRNGKey(10), (2, DIMS.n_mels, 60))
        prompt = jnp.tile(jnp.array([[1, 2]], jnp.int32), (2, 1))
        tokens, lengths = greedy_decode(
            params, encode(params, mel, DIMS), prompt, DIMS, eot=EOT,
            max_new_tokens=6, kv_cache_dtype=jnp.float8_e4m3fn,
        )
        assert tokens.shape == (2, 8) and (np.asarray(lengths) > 0).all()

    def test_engine_kv_dtype_config(self, rng):
        cfg = EngineConfig(model="dev", language="en", max_new_tokens=3,
                           dtype="float32", kv_cache_dtype="float8_e4m3fn")
        eng = create_engine(EngineType.MONOLITH, cfg)
        res = eng.transcribe(rng.normal(size=8000).astype(np.float32) * 0.1)
        assert res.length > 0
