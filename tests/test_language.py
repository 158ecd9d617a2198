"""Language auto-detection tests (decode/language.py + engine wiring).

The reference hardcodes "de" into the decoder prompt (whisper.cpp:327-339);
detection from the SOT-position logits is a new capability, so the invariants
are internal consistency (detection == manual prefill argmax over the
language block) and correct engine plumbing of the detected token.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import EngineConfig, ModelDims
from whisper_tpu.decode.language import (
    detect_language_tokens,
    lang_token_to_code,
    n_langs_for,
)
from whisper_tpu.engine.engine import EngineType, create_engine
from whisper_tpu.models.decoder import decoder_prefill, init_kv_cache, precompute_cross_kv
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params
from whisper_tpu.tokenizer.languages import language_id

# Real multilingual vocab geometry, tiny width (language block must exist).
DIMS = ModelDims(
    n_mels=80, n_audio_ctx=30, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_text_ctx=32, n_text_state=64, n_text_head=2,
    n_text_layer=2,
)
SOT = 50258


@pytest.fixture(scope="module")
def params():
    return init_params(DIMS, jax.random.PRNGKey(0))


class TestDetect:
    @pytest.mark.slow
    def test_matches_manual_prefill(self, params):
        mel = jax.random.normal(jax.random.PRNGKey(1), (3, DIMS.n_mels, 60))
        enc_out = encode(params, mel, DIMS)
        toks = np.asarray(detect_language_tokens(params, enc_out, DIMS, sot=SOT))

        cross_kv = precompute_cross_kv(params, enc_out, DIMS)
        cache = init_kv_cache(DIMS, 3, 1)
        logits, _ = decoder_prefill(
            params, jnp.full((3, 1), SOT, jnp.int32), cache, cross_kv, DIMS
        )
        block = np.asarray(logits[:, 0, SOT + 1 : SOT + 1 + n_langs_for(DIMS)])
        expected = SOT + 1 + block.argmax(axis=-1)
        np.testing.assert_array_equal(toks, expected)
        assert all(SOT + 1 <= t < SOT + 1 + 100 for t in toks)

    def test_probs_normalized(self, params):
        mel = jax.random.normal(jax.random.PRNGKey(2), (2, DIMS.n_mels, 60))
        enc_out = encode(params, mel, DIMS)
        toks, probs = detect_language_tokens(
            params, enc_out, DIMS, sot=SOT, return_probs=True
        )
        assert probs.shape == (2, n_langs_for(DIMS))
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)

    def test_n_langs(self):
        assert n_langs_for(DIMS) == 99
        assert n_langs_for(dataclasses.replace(DIMS, n_vocab=51866)) == 100

    def test_token_code_mapping(self):
        assert lang_token_to_code(SOT + 1 + language_id("de"), SOT) == "de"
        assert lang_token_to_code(SOT + 1 + language_id("en"), SOT) == "en"
        assert lang_token_to_code(SOT + 1 + language_id("yue"), SOT) == "yue"
        assert lang_token_to_code(12, SOT) == ""  # out of range


class TestEngineAutodetect:
    def test_autodetect_fills_language(self, rng):
        cfg = EngineConfig(model="dev", language=None, max_new_tokens=3,
                           dtype="float32")
        eng = create_engine(EngineType.MONOLITH, cfg)
        assert eng._autodetect
        res = eng.transcribe(rng.normal(size=16000).astype(np.float32) * 0.1)
        assert res.language != ""
        assert res.tokens[1] == SOT + 1 + language_id(res.language)

    def test_explicit_language_respected(self, rng):
        cfg = EngineConfig(model="dev", language="de", max_new_tokens=3,
                           dtype="float32")
        eng = create_engine(EngineType.MONOLITH, cfg)
        assert not eng._autodetect
        res = eng.transcribe(rng.normal(size=16000).astype(np.float32) * 0.1)
        assert res.language == "de"

    def test_encdec_and_monolith_agree(self, rng):
        cfg = EngineConfig(model="dev", language=None, max_new_tokens=3,
                           dtype="float32")
        mono = create_engine(EngineType.MONOLITH, cfg, seed=7)
        encd = create_engine(EngineType.ENCDEC, cfg, seed=7)
        x = rng.normal(size=16000).astype(np.float32) * 0.1
        a, b = mono.transcribe(x), encd.transcribe(x)
        assert a.language == b.language
        np.testing.assert_array_equal(a.tokens[: a.length], b.tokens[: b.length])
