"""Temperature sampling + fallback (decode/greedy.py gumbel-argmax,
decode/fallback.py gates, engine orchestration).

The reference decodes greedy-only (whisper.cpp:346-399); sampling + the
openai-whisper temperature-fallback retry ladder is net-new capability, so
these tests pin it against first principles (the Gumbel-max identity) and
against openai-whisper's documented gate semantics rather than reference
code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import EngineConfig
from whisper_tpu.decode.fallback import (
    DEFAULT_TEMPERATURES,
    compression_ratio,
    needs_fallback,
    normalize_schedule,
)
from whisper_tpu.engine import EngineType, create_engine


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(7)
    return (0.1 * rng.standard_normal((3, 16_000))).astype(np.float32)


def _cfg(**kw):
    base = dict(model="dev", language="en", max_new_tokens=5, dtype="float32")
    base.update(kw)
    return EngineConfig(**base)


class TestGates:
    def test_compression_ratio_repetition(self):
        natural = "Mr Quilter is the apostle of the middle classes."
        loop = "the the the the the the the the the the the the the the"
        assert compression_ratio(loop) > compression_ratio(natural)
        assert compression_ratio(loop) > 2.4
        assert compression_ratio("") == 0.0

    def test_needs_fallback_each_gate(self):
        loop = "ha " * 60
        assert needs_fallback(loop, avg_logprob=0.0)
        assert not needs_fallback("a normal sentence", avg_logprob=-0.2)
        assert needs_fallback("a normal sentence", avg_logprob=-3.0)
        # disabled gates
        assert not needs_fallback(loop, 0.0, compression_ratio_threshold=None)
        assert not needs_fallback(
            "x", -3.0, logprob_threshold=None
        )
        # score unavailable → logprob gate skipped
        assert not needs_fallback("a normal sentence", avg_logprob=None)

    def test_normalize_schedule(self):
        assert normalize_schedule(0.0, DEFAULT_TEMPERATURES[1:]) == (
            DEFAULT_TEMPERATURES
        )
        # entries at/below the starting temperature are dropped
        assert normalize_schedule(0.4, (0.2, 0.4, 0.6, 1.0)) == (0.4, 0.6, 1.0)
        assert normalize_schedule(0.0, None) == (0.0,)


class TestGumbelSampling:
    def test_gumbel_max_matches_softmax_distribution(self):
        """argmax(logits + T*gumbel) must sample softmax(logits/T): check
        empirical frequencies over many keys against the closed form."""
        logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
        temp = jnp.float32(1.0)

        def draw(i):
            u = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0), i),
                logits.shape,
                minval=jnp.finfo(jnp.float32).tiny,
                maxval=1.0,
            )
            g = -jnp.log(-jnp.log(u))
            return jnp.argmax(logits + temp * g, axis=-1)[0]

        n = 4000
        picks = np.asarray(jax.vmap(draw)(jnp.arange(n)))
        freq = np.bincount(picks, minlength=4) / n
        want = np.asarray(jax.nn.softmax(logits[0]))
        np.testing.assert_allclose(freq, want, atol=0.03)

    def test_t0_sampling_equals_greedy_engine(self, audio):
        plain = create_engine(EngineType.MONOLITH, _cfg(), seed=0)
        sampled = create_engine(
            EngineType.MONOLITH,
            _cfg(
                fallback_temperatures=(0.5,),
                logprob_threshold=None,
                compression_ratio_threshold=None,
            ),
            seed=0,
        )
        a = plain.transcribe_batch(audio)
        b = sampled.transcribe_batch(audio)
        for ra, rb in zip(a, b):
            assert list(ra.tokens) == list(rb.tokens)
            assert rb.temperature == 0.0
            assert rb.avg_logprob is not None and rb.avg_logprob < 0.0
            assert rb.compression_ratio is not None

    @pytest.mark.slow
    def test_sampling_deterministic_and_seed_sensitive(self, audio):
        e1 = create_engine(
            EngineType.MONOLITH, _cfg(temperature=1.0), seed=0
        )
        r1 = e1.transcribe_batch(audio)
        r2 = e1.transcribe_batch(audio)
        for a, b in zip(r1, r2):
            assert list(a.tokens) == list(b.tokens)
        e2 = create_engine(
            EngineType.MONOLITH, _cfg(temperature=1.0, sampling_seed=1), seed=0
        )
        r3 = e2.transcribe_batch(audio)
        assert any(
            list(a.tokens) != list(b.tokens) for a, b in zip(r1, r3)
        ), "different sampling seeds should diverge at T=1"

    @pytest.mark.slow
    def test_avg_logprob_matches_teacher_forcing(self, audio):
        """sum-logprob accounting: re-score the sampled tokens by running
        the decoder over them and summing log_softmax at each choice."""
        from whisper_tpu.decode.logits import make_rules
        from whisper_tpu.models.decoder import (
            decoder_prefill,
            init_kv_cache,
            precompute_cross_kv,
        )
        from whisper_tpu.frontend.mel import log_mel_spectrogram
        from whisper_tpu.models.encoder import encode

        eng = create_engine(
            EngineType.MONOLITH,
            # audio_ctx=None: the teacher-forcing replica below encodes the
            # full window, so the engine must too (the default "auto"
            # crops this short fixture and legitimately shifts logprobs).
            _cfg(fallback_temperatures=(0.5,), logprob_threshold=None,
                 compression_ratio_threshold=None, audio_ctx=None),
            seed=0,
        )
        res = eng.transcribe_batch(audio[:1])[0]
        p_len = len(eng._prompt)
        gen = res.length - p_len

        # Teacher-force: full-sequence prefill over [prompt + sampled[:-1]]
        # gives logits at every position; logprob of token t+1 reads row t.
        dims, params = eng.dims, eng.assets.params
        batch = np.zeros((1, 480_000), np.float32)
        batch[0, : audio.shape[1]] = audio[0]
        mel = log_mel_spectrogram(
            jnp.asarray(batch), eng._filters, n_mels=dims.n_mels,
            compute_dtype=jnp.float32,
        )
        enc_out = encode(params, mel.astype(jnp.float32), dims)
        cross_kv = precompute_cross_kv(params, enc_out, dims)
        seq = jnp.asarray(res.tokens[: res.length - 1][None, :], jnp.int32)
        cache = init_kv_cache(dims, 1, int(seq.shape[1]), jnp.float32)
        logits, _ = decoder_prefill(
            params, seq, cache, cross_kv, dims, jnp.float32
        )
        rules = eng._rules
        want = 0.0
        toks = jnp.asarray(res.tokens[None, :], jnp.int32)
        for i in range(gen):
            pos = p_len + i
            row = logits[:, pos - 1, :]
            if rules is not None:
                row = rules.apply(row, toks, jnp.int32(pos), jnp.int32(p_len))
            lp = jax.nn.log_softmax(row.astype(jnp.float32), axis=-1)
            want += float(lp[0, int(res.tokens[pos])])
        got = res.avg_logprob * gen
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestFallbackOrchestration:
    def test_always_failing_gate_walks_ladder(self, audio):
        eng = create_engine(
            EngineType.MONOLITH,
            _cfg(fallback_temperatures=(0.5, 1.0), logprob_threshold=1e9,
                 compression_ratio_threshold=None),
            seed=0,
        )
        res = eng.transcribe_batch(audio)
        assert all(r.temperature == 1.0 for r in res)

    def test_passing_gate_stays_at_t0(self, audio):
        eng = create_engine(
            EngineType.MONOLITH,
            _cfg(fallback_temperatures=(0.5, 1.0), logprob_threshold=-1e9,
                 compression_ratio_threshold=None),
            seed=0,
        )
        res = eng.transcribe_batch(audio)
        assert all(r.temperature == 0.0 for r in res)

    def test_encdec_fallback(self, audio):
        eng = create_engine(
            EngineType.ENCDEC,
            _cfg(fallback_temperatures=(1.0,), logprob_threshold=1e9,
                 compression_ratio_threshold=None),
            seed=0,
        )
        res = eng.transcribe_batch(audio[:2])
        assert all(r.temperature == 1.0 for r in res)

    @pytest.mark.slow
    def test_beam_primary_with_sampling_retries(self, audio):
        """Beam decodes the primary (T=0); failed rows retry via sampling —
        openai semantics. Beam scores feed the logprob gate."""
        eng = create_engine(
            EngineType.MONOLITH,
            _cfg(beam_size=2, fallback_temperatures=(1.0,),
                 logprob_threshold=1e9, compression_ratio_threshold=None),
            seed=0,
        )
        res = eng.transcribe_batch(audio[:2])
        assert all(r.temperature == 1.0 for r in res)

    def test_beam_with_temperature_rejected(self):
        with pytest.raises(ValueError, match="beam"):
            create_engine(
                EngineType.MONOLITH, _cfg(beam_size=2, temperature=0.5),
                seed=0,
            )

    def test_negative_temperature_rejected(self):
        with pytest.raises(ValueError, match="temperature"):
            create_engine(
                EngineType.MONOLITH, _cfg(temperature=-0.1), seed=0
            )
