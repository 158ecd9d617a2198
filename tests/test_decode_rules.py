"""Logit-rule and beam-search tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import ModelDims
from whisper_tpu.decode.beam import beam_decode
from whisper_tpu.decode.greedy import greedy_decode
from whisper_tpu.decode.logits import (
    LogitRules,
    blank_token_ids,
    make_rules,
    nonspeech_token_ids,
)
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params
from whisper_tpu.tokenizer.vocab import Vocab

DIMS = ModelDims(
    n_mels=80,
    n_audio_ctx=30,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=600,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)
EOT = 599


@pytest.fixture(scope="module")
def params():
    return init_params(DIMS, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def enc_out(params):
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, DIMS.n_mels, 60))
    return encode(params, mel, DIMS)


def _toy_vocab():
    # Real-shape vocab with controllable surfaces.
    table = {i: f"t{i}".encode() for i in range(256)}
    table[7] = b" "
    table[11] = b"("
    table[12] = b" ("
    table[13] = b"<<"
    table[14] = b"\xe2\x99\xaa"  # ♪
    return Vocab(table, multilingual=False, n_vocab=256)


class TestSuppressionTables:
    def test_nonspeech_detection(self):
        v = _toy_vocab()
        ids = nonspeech_token_ids(v)
        assert {11, 12, 13, 14}.issubset(ids)
        assert 7 not in ids  # blank is not "non-speech"

    def test_blank_ids(self):
        assert blank_token_ids(_toy_vocab()) == (7,)

    def test_static_bias_hits_specials(self):
        v = _toy_vocab()
        rules = make_rules(v)
        st = v.specials
        assert rules.static_bias[st.sot] < -1e29
        assert rules.static_bias[st.prev] < -1e29
        assert rules.static_bias[st.eot] == 0.0  # EOT always allowed


class TestRuleApplication:
    def _mini_rules(self, timestamps=False):
        # Hand-built rules over a 600-token vocab with REAL whisper geometry:
        # text < eot < specials < beg <= timestamps (beg is the last special,
        # everything >= beg is a timestamp).
        static = np.zeros(600, np.float32)
        static[0] = -1e30
        blank = np.zeros(600, np.float32)
        blank[1] = -1e30
        return LogitRules(
            n_vocab=600, eot=580, sot=581, not_=586, beg=590,
            static_bias=static, blank_bias=blank, timestamps=timestamps,
            max_initial_timestamp_index=5,
        )

    def test_static_and_blank(self):
        rules = self._mini_rules()
        logits = jnp.zeros((2, 600))
        tokens = jnp.zeros((2, 8), jnp.int32)
        out = rules.apply(logits, tokens, jnp.int32(2), jnp.int32(2))
        assert out[0, 0] < -1e29  # static everywhere
        assert out[0, 1] < -1e29  # blank at first position
        out2 = rules.apply(logits, tokens, jnp.int32(3), jnp.int32(2))
        assert out2[0, 1] == 0.0  # blank rule only at sample_begin

    def test_timestamp_pairing(self):
        rules = self._mini_rules(timestamps=True)
        logits = jnp.zeros((1, 600))
        # After text ... <ts>: text must be masked (need closing timestamp).
        tokens = jnp.array([[10, 11, 591, 0, 0, 0, 0, 0]], jnp.int32)
        out = rules.apply(logits, tokens, jnp.int32(3), jnp.int32(0))
        assert out[0, 20] < -1e29  # text masked
        assert out[0, 592] > -1e29  # later timestamp allowed
        assert out[0, 580] > -1e29  # EOT stays legal
        # After <ts> <ts>: timestamps masked (must emit text).
        tokens2 = jnp.array([[10, 591, 591, 0, 0, 0, 0, 0]], jnp.int32)
        out2 = rules.apply(logits, tokens2, jnp.int32(3), jnp.int32(0))
        assert out2[0, 592] < -1e29
        assert out2[0, 20] > -1e29

    def test_timestamp_monotonic(self):
        rules = self._mini_rules(timestamps=True)
        logits = jnp.zeros((1, 600))
        tokens = jnp.array([[593, 10, 593, 0, 0, 0, 0, 0]], jnp.int32)
        out = rules.apply(logits, tokens, jnp.int32(3), jnp.int32(0))
        # Timestamps below the max seen (593) are dead; >= 593 allowed.
        assert out[0, 591] < -1e29 and out[0, 592] < -1e29
        assert out[0, 593] > -1e29 and out[0, 594] > -1e29

    def test_initial_timestamp_constraint(self):
        rules = self._mini_rules(timestamps=True)
        logits = jnp.zeros((1, 600))
        tokens = jnp.zeros((1, 8), jnp.int32)
        out = rules.apply(logits, tokens, jnp.int32(0), jnp.int32(0))
        assert out[0, 20] < -1e29  # text masked at first position
        assert out[0, 590] > -1e29  # timestamp 0 allowed
        assert out[0, 597] < -1e29  # beyond max_initial (590+5)


class TestBeam:
    @pytest.mark.slow
    def test_beam1_matches_greedy_when_unique(self, params, enc_out):
        prompt = jnp.array([[1, 2], [3, 4]], jnp.int32)
        g_tokens, g_lengths = greedy_decode(
            params, enc_out, prompt, DIMS, eot=EOT, max_new_tokens=6
        )
        b_tokens, b_lengths, _ = beam_decode(
            params, enc_out, prompt, DIMS, eot=EOT, max_new_tokens=6, beam_size=1
        )
        np.testing.assert_array_equal(np.asarray(g_tokens), np.asarray(b_tokens))
        np.testing.assert_array_equal(np.asarray(g_lengths), np.asarray(b_lengths))

    @pytest.mark.slow
    def test_beam_score_not_worse_than_greedy(self, params, enc_out):
        # Beam-5's best normalized sum-logprob must be >= greedy's path score.
        prompt = jnp.array([[1, 2], [3, 4]], jnp.int32)
        g_tokens, g_lengths = greedy_decode(
            params, enc_out, prompt, DIMS, eot=EOT, max_new_tokens=6
        )
        _, _, b_scores = beam_decode(
            params, enc_out, prompt, DIMS, eot=EOT, max_new_tokens=6, beam_size=5
        )

        # Recompute greedy path score.
        from whisper_tpu.models.decoder import (
            decoder_prefill,
            init_kv_cache,
            precompute_cross_kv,
        )

        cross = precompute_cross_kv(params, enc_out, DIMS)
        g = np.asarray(g_tokens)
        glen = np.asarray(g_lengths)
        total = g.shape[1]
        cache = init_kv_cache(DIMS, 2, total)
        logits, _ = decoder_prefill(
            params, jnp.asarray(g, jnp.int32), cache, cross, DIMS
        )
        lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        for i in range(2):
            score = sum(
                lp[i, t - 1, g[i, t]] for t in range(2, int(glen[i]))
            )
            norm = max(int(glen[i]) - 2, 1)
            assert float(np.asarray(b_scores)[i]) >= score / norm - 1e-4

    def test_beam_is_jittable(self, params, enc_out):
        f = jax.jit(
            lambda p, e, pr: beam_decode(
                p, e, pr, DIMS, eot=EOT, max_new_tokens=4, beam_size=3
            )
        )
        prompt = jnp.array([[1, 2], [3, 4]], jnp.int32)
        t1 = f(params, enc_out, prompt)
        jax.block_until_ready(t1)

    def test_greedy_with_rules_runs(self, params, enc_out):
        static = np.zeros(DIMS.n_vocab, np.float32)
        static[5] = -1e30
        rules = LogitRules(
            n_vocab=DIMS.n_vocab, eot=EOT, sot=595, not_=596, beg=590,
            static_bias=static, blank_bias=np.zeros(DIMS.n_vocab, np.float32),
        )
        prompt = jnp.array([[1, 2]], jnp.int32)
        tokens, _ = greedy_decode(
            params, enc_out[:1], prompt, DIMS, eot=EOT, max_new_tokens=6,
            rules=rules,
        )
        assert 5 not in np.asarray(tokens)[0, 2:]
