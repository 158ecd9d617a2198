"""Speculative decoding (decode/speculative.py): output must be
BIT-IDENTICAL to the target's own greedy decode for ANY draft — the core
exactness contract — with acceptance/round stats behaving as designed.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import MODEL_DIMS, EngineConfig
from whisper_tpu.decode.greedy import greedy_decode
from whisper_tpu.decode.speculative import speculative_greedy_decode
from whisper_tpu.models.params import init_params

DIMS = MODEL_DIMS["dev"]
EOT = 50257


@pytest.fixture(scope="module")
def setup():
    pt = init_params(DIMS, jax.random.PRNGKey(0))
    pd = init_params(DIMS, jax.random.PRNGKey(7))  # unrelated draft
    enc = 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), (3, DIMS.n_audio_ctx, DIMS.n_audio_state)
    )
    prompt = jnp.tile(
        jnp.array([[50258, 50259, 50359, 50363]], jnp.int32), (3, 1)
    )
    return pt, pd, enc, prompt


class TestExactness:
    @pytest.mark.parametrize("k", [1, 3, 4])
    def test_unrelated_draft_matches_greedy(self, setup, k):
        pt, pd, enc, prompt = setup
        ref_t, ref_l = greedy_decode(
            pt, enc, prompt, DIMS, eot=EOT, max_new_tokens=12
        )
        toks, lens, stats = speculative_greedy_decode(
            pt, pd, enc, prompt, DIMS, DIMS, eot=EOT, max_new_tokens=12,
            k_draft=k,
        )
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_t))
        np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_l))
        # An unrelated random draft almost surely never matches a 51k-way
        # argmax; every round advances exactly one (corrected) token.
        assert int(stats["accepted"]) == 0

    def test_self_draft_full_acceptance(self, setup):
        pt, _, enc, prompt = setup
        ref_t, _ = greedy_decode(
            pt, enc, prompt, DIMS, eot=EOT, max_new_tokens=12
        )
        toks, lens, stats = speculative_greedy_decode(
            pt, pt, enc, prompt, DIMS, DIMS, eot=EOT, max_new_tokens=12,
            k_draft=4,
        )
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_t))
        # draft == target: k accepted + 1 bonus per round → ceil(11/5)=3.
        assert int(stats["rounds"]) == 3
        # Rows need 11 post-first tokens: rounds 1-2 accept 4 drafts each
        # (+1 bonus); round 3 is budget-clamped to ONE committed token,
        # which is itself a matched draft (accepted), while the round's
        # other 3 proposals count as drafted-but-wasted (honest rate).
        assert int(stats["accepted"]) == 9 * 3
        assert int(stats["drafted"]) == 4 * 3 * 3

    def test_rules_and_bias_parity(self, setup):
        from whisper_tpu.decode.logits import make_rules
        from whisper_tpu.tokenizer.vocab import Vocab, num_languages_for

        pt, pd, enc, prompt = setup
        vocab = Vocab.synthetic(
            multilingual=True,
            num_languages=num_languages_for(DIMS.n_vocab),
        )
        rules = make_rules(
            vocab, timestamps=True, suppress_blank=True,
            suppress_nonspeech=True, n_vocab=DIMS.n_vocab,
        )
        bias = np.zeros(DIMS.n_vocab, np.float32)
        bias[100:200] = 3.0
        bias = jnp.asarray(bias)
        kw = dict(
            eot=EOT, max_new_tokens=10, rules=rules, logit_bias=bias,
        )
        ref = greedy_decode(pt, enc, prompt, DIMS, **kw)
        got = speculative_greedy_decode(
            pt, pd, enc, prompt, DIMS, DIMS, k_draft=3, **kw
        )
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))

    def test_eot_freeze_parity(self, setup):
        # Force EOT quickly on some rows: suppress everything except EOT
        # after boosting a couple of tokens — rows finish at different
        # steps, exercising per-row freeze + budget clamps.
        pt, pd, enc, prompt = setup
        bias = np.full(DIMS.n_vocab, 0.0, np.float32)
        bias[EOT] = 2.6  # near the dev-model argmax margin: mixed stops
        bias = jnp.asarray(bias)
        kw = dict(eot=EOT, max_new_tokens=9, logit_bias=bias)
        ref = greedy_decode(pt, enc, prompt, DIMS, **kw)
        got = speculative_greedy_decode(
            pt, pd, enc, prompt, DIMS, DIMS, k_draft=4, **kw
        )
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))

    def test_no_speech_probs_match(self, setup):
        pt, pd, enc, prompt = setup
        ns = (0, 50362)
        ref = greedy_decode(
            pt, enc, prompt, DIMS, eot=EOT, max_new_tokens=6, no_speech=ns
        )
        got = speculative_greedy_decode(
            pt, pd, enc, prompt, DIMS, DIMS, eot=EOT, max_new_tokens=6,
            k_draft=2, no_speech=ns,
        )
        np.testing.assert_allclose(
            np.asarray(got[3]), np.asarray(ref[2]), rtol=1e-6
        )

    def test_jittable_single_program(self, setup):
        pt, pd, enc, prompt = setup
        f = jax.jit(
            lambda a, b, e, p: speculative_greedy_decode(
                a, b, e, p, DIMS, DIMS, eot=EOT, max_new_tokens=8, k_draft=3
            )[:2]
        )
        t1, l1 = f(pt, pd, enc, prompt)
        t2, l2 = f(pt, pd, enc, prompt)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


class TestEngineIntegration:
    def test_monolith_draft_parity(self):
        from whisper_tpu.engine import EngineType, create_engine

        rng = np.random.default_rng(0)
        samples = (0.1 * rng.standard_normal((2, 16_000))).astype(np.float32)
        base = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", dtype="float32",
                         max_new_tokens=8),
            seed=0,
        )
        spec = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", dtype="float32",
                         max_new_tokens=8, draft_model="dev", k_draft=3),
            seed=0,
        )
        ref = base.transcribe_batch(samples)
        got = spec.transcribe_batch(samples)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(
                g.tokens[: g.length], r.tokens[: r.length]
            )
            assert g.text == r.text

    def test_draft_with_own_frontend_geometry(self):
        # Target with 128 mel bins + draft with 80 (the large-v3 + tiny
        # pairing, dev-scale): the Monolith runs the draft's own
        # mel+encoder; output still exactly the target's greedy.
        import whisper_tpu.config as cfg
        from whisper_tpu.engine import EngineType, create_engine

        cfg.MODEL_DIMS["dev128"] = dataclasses.replace(
            MODEL_DIMS["dev"], n_mels=128
        )
        try:
            rng = np.random.default_rng(1)
            samples = (0.1 * rng.standard_normal((2, 16_000))).astype(
                np.float32
            )
            base = create_engine(
                EngineType.MONOLITH,
                EngineConfig(model="dev128", language="en", dtype="float32",
                             max_new_tokens=6),
                seed=0,
            )
            spec = create_engine(
                EngineType.MONOLITH,
                EngineConfig(model="dev128", language="en", dtype="float32",
                             max_new_tokens=6, draft_model="dev", k_draft=2),
                seed=0,
            )
            ref = base.transcribe_batch(samples)
            got = spec.transcribe_batch(samples)
            for r, g in zip(ref, got):
                np.testing.assert_array_equal(
                    g.tokens[: g.length], r.tokens[: r.length]
                )
        finally:
            cfg.MODEL_DIMS.pop("dev128", None)

    def test_encdec_rejects_foreign_frontend_draft(self):
        import whisper_tpu.config as cfg
        from whisper_tpu.engine import EngineType, create_engine

        cfg.MODEL_DIMS["dev128"] = dataclasses.replace(
            MODEL_DIMS["dev"], n_mels=128
        )
        try:
            with pytest.raises(ValueError, match="frontend geometry"):
                create_engine(
                    EngineType.ENCDEC,
                    EngineConfig(model="dev128", language="en",
                                 dtype="float32", draft_model="dev"),
                    seed=0,
                )
        finally:
            cfg.MODEL_DIMS.pop("dev128", None)

    def test_beam_plus_draft_rejected(self):
        from whisper_tpu.engine import EngineType, create_engine

        with pytest.raises(ValueError, match="greedy-only"):
            create_engine(
                EngineType.MONOLITH,
                EngineConfig(model="dev", language="en", beam_size=3,
                             draft_model="dev"),
                seed=0,
            )


class TestDraftCacheContinuity:
    """Regression (review r5): full-accept rounds must leave the draft
    cache gapless — the k-step draft scan never wrote the LAST proposal's
    K/V row, so every full-accept round left a permanent zero row the
    draft attended over, decaying acceptance. With the k+1-step scan, a
    self-draft sustains 100% acceptance over a long budget: any hole
    would corrupt later proposals and inflate the round count."""

    def test_long_self_draft_round_count(self):
        pt = init_params(DIMS, jax.random.PRNGKey(0))
        enc = 0.3 * jax.random.normal(
            jax.random.PRNGKey(2), (2, DIMS.n_audio_ctx, DIMS.n_audio_state)
        )
        prompt = jnp.tile(
            jnp.array([[50258, 50259, 50359, 50363]], jnp.int32), (2, 1)
        )
        ref_t, _ = greedy_decode(
            pt, enc, prompt, DIMS, eot=EOT, max_new_tokens=48
        )
        toks, lens, stats = speculative_greedy_decode(
            pt, pt, enc, prompt, DIMS, DIMS, eot=EOT, max_new_tokens=48,
            k_draft=4,
        )
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_t))
        # 47 post-first tokens at 5/round with sustained full acceptance.
        assert int(stats["rounds"]) == 10, int(stats["rounds"])
