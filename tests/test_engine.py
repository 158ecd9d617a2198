"""Engine API tests: Monolith vs EncDec parity, batching, file I/O
(reference surface whisper.h:159-204, factory whisper.cpp:778-790)."""

import numpy as np
import pytest

from whisper_tpu.config import EngineConfig
from whisper_tpu.engine import EncDec, EngineType, Monolith, create_engine


def _noise(seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(int(16_000 * seconds))).astype(np.float32)


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(model="dev.en", max_new_tokens=6, dtype="float32")


@pytest.fixture(scope="module")
def monolith(cfg):
    return Monolith.from_random(cfg, seed=0)


@pytest.fixture(scope="module")
def encdec(cfg):
    return EncDec.from_random(cfg, seed=0)


class TestEngineParity:
    def test_monolith_encdec_same_tokens(self, monolith, encdec):
        # Same weights, same input → identical IDs: the reference treats the
        # two engines as interchangeable surfaces over one model.
        x = _noise()
        a = monolith.transcribe(x)
        b = encdec.transcribe(x)
        np.testing.assert_array_equal(a.tokens, b.tokens)
        assert a.text == b.text

    def test_prompt_included_in_output(self, monolith):
        # English prompt [sot, notimestamps] = [50257, 50362] leads the IDs,
        # as in the golden output (whisper.h:27-32).
        r = monolith.transcribe(_noise())
        assert r.tokens[0] == 50257 and r.tokens[1] == 50362

    def test_batch_matches_single(self, monolith):
        xs = np.stack([_noise(seed=s) for s in range(3)])
        batch = monolith.transcribe_batch(xs)
        for i in range(3):
            solo = monolith.transcribe(xs[i])
            np.testing.assert_array_equal(batch[i].tokens, solo.tokens)

    def test_transcribe_file(self, monolith, tmp_path):
        from whisper_tpu.audio.wav import write_wav

        p = str(tmp_path / "t.wav")
        write_wav(p, _noise())
        r = monolith.transcribe(p)
        assert isinstance(r.text, str)
        assert r.length >= 2

    def test_omit_special_tokens(self, monolith):
        x = _noise()
        raw = monolith.transcribe(x, omit_special_tokens=False)
        clean = monolith.transcribe(x, omit_special_tokens=True)
        # Prompt surfaces visible only in raw mode ("special" = id >= eot,
        # whisper.cpp:648).
        assert raw.text.startswith("<|startoftranscript_|><|notimestamps|>")
        assert "<|startoftranscript_|>" not in clean.text
        assert "<|notimestamps|>" not in clean.text

    def test_factory(self, cfg):
        e0 = create_engine(EngineType.MONOLITH, cfg)
        e1 = create_engine(1, cfg)
        assert isinstance(e0, Monolith) and isinstance(e1, EncDec)

    def test_long_audio_truncated(self, monolith):
        # 31 s input → padded/truncated to exactly 480,000 samples
        # (whisper.cpp:698) — must not crash and equals the 30 s prefix.
        x31 = _noise(seconds=31.0)
        a = monolith.transcribe(x31)
        b = monolith.transcribe(x31[: 16_000 * 30])
        np.testing.assert_array_equal(a.tokens, b.tokens)


class TestReferenceQuirks:
    """EngineConfig.reference_quirks reaches the advertised bit-parity
    switches (round-1 weak #8: they were internals-only)."""

    def test_literal_reference_prompt(self):
        # whisper.cpp:331-339 hardcodes "de" and the UNSHIFTED task IDs:
        # expected sequence [50258, 50261, 50359, 50363].
        eng = Monolith.from_random(
            EngineConfig(model="dev", language="de", max_new_tokens=4,
                         dtype="float32", reference_quirks=True),
            seed=0,
        )
        assert eng._prompt.tolist() == [50258, 50261, 50359, 50363]
        # Without quirks the corrected real-tokenizer table applies — for a
        # 99-language multilingual model that is the SAME sequence (the
        # reference hardcoded the right IDs even though its own "+1 shift"
        # table was wrong); large-v3's 100-language layout differs.
        plain = Monolith.from_random(
            EngineConfig(model="dev", language="de", max_new_tokens=4,
                         dtype="float32"),
            seed=0,
        )
        assert plain._prompt.tolist() == [50258, 50261, 50359, 50363]
        from whisper_tpu.decode.prompt import build_prompt
        from whisper_tpu.tokenizer.vocab import special_tokens_for

        v3 = build_prompt(
            multilingual=True, language="de",
            specials=special_tokens_for(True, num_languages=100),
        )
        assert v3 == [50258, 50261, 50360, 50364]

    def test_quirk_downmix_through_engine(self, tmp_path):
        # Stereo downmix by INT32_MAX (wav_util.cpp:122-126) via the engine's
        # file reader when quirks are on; sane (l+r)/2 scaling otherwise.
        import struct
        import wave

        p = str(tmp_path / "stereo.wav")
        frames = np.array([[1000, 3000], [-2000, 500]], dtype=np.int16)
        with wave.open(p, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16_000)
            w.writeframes(frames.tobytes())

        quirky = Monolith.from_random(
            EngineConfig(model="dev", language="de", max_new_tokens=4,
                         dtype="float32", reference_quirks=True),
            seed=0,
        )
        got = quirky._read_audio(p)
        want = frames.astype(np.float64).sum(axis=1) / (2**31 - 1)
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)

        plain = Monolith.from_random(
            EngineConfig(model="dev", language="de", max_new_tokens=4,
                         dtype="float32"),
            seed=0,
        )
        got_plain = plain._read_audio(p)
        want_plain = frames.astype(np.float64).sum(axis=1) / (2.0 * 32767)
        np.testing.assert_allclose(
            got_plain, want_plain.astype(np.float32), rtol=1e-6
        )


class TestBatchBucketing:
    def test_bucket_sizes(self):
        from whisper_tpu.engine.engine import batch_bucket

        assert [batch_bucket(b) for b in (1, 2, 3, 4, 5, 8, 9)] == \
            [1, 2, 4, 4, 8, 8, 16]

    @pytest.mark.slow
    def test_varied_batch_sizes_bounded_compiles(self):
        """Batch sizes 1..5 land in buckets {1,2,4,8}: ≤4 executables instead
        of one per distinct size, and padded rows never leak into results."""
        eng = Monolith.from_random(
            EngineConfig(model="dev.en", max_new_tokens=4, dtype="float32"),
            seed=0,
        )
        singles = {}
        for b in (1, 2, 3, 4, 5):
            xs = np.stack([_noise(seed=s) for s in range(b)])
            rs = eng.transcribe_batch(xs)
            assert len(rs) == b
            for i, r in enumerate(rs):
                if i not in singles:
                    singles[i] = eng.transcribe(xs[i])
                np.testing.assert_array_equal(r.tokens, singles[i].tokens)
        # buckets hit: 1, 2, 4 (b=3,4), 8 (b=5) + the size-1 single calls —
        # all same-length noise, so one audio_ctx crop entry.
        assert len(eng._pipelines) == 1
        (prog,) = eng._pipelines.values()
        assert prog._cache_size() <= 4


class TestBeamEngine:
    def test_beam_engine_runs_and_batches(self, cfg):
        import dataclasses

        bcfg = dataclasses.replace(cfg, beam_size=3)
        eng = Monolith.from_random(bcfg, seed=0)
        xs = np.stack([_noise(seed=s) for s in range(2)])
        batch = eng.transcribe_batch(xs)
        solo = eng.transcribe(xs[0])
        np.testing.assert_array_equal(batch[0].tokens, solo.tokens)


class TestTranscribeFiles:
    def test_files_batch_matches_single(self, monolith, tmp_path, rng):
        from whisper_tpu.audio.wav import write_wav

        paths = []
        for i in range(3):
            x = (rng.normal(size=8000 + i * 500) * 0.1).astype(np.float32)
            p = str(tmp_path / f"u{i}.wav")
            write_wav(p, x)
            paths.append(p)
        batch_results = monolith.transcribe_files(paths)
        assert len(batch_results) == 3
        for p, r in zip(paths, batch_results):
            single = monolith.transcribe(p)
            np.testing.assert_array_equal(
                r.tokens[: r.length], single.tokens[: single.length]
            )


class TestTranscribeBatches:
    """Pipelined multi-batch path (Monolith.transcribe_batches): overlapped
    dispatch must be token-identical to sequential transcribe_batch."""

    def test_pipelined_parity(self, monolith):
        batches = [
            np.stack([_noise(seed=10 * i + j) for j in range(2)])
            for i in range(3)
        ]
        seq = [monolith.transcribe_batch(b) for b in batches]
        pipe = monolith.transcribe_batches(batches)
        assert len(pipe) == len(seq)
        for s_list, p_list in zip(seq, pipe):
            assert len(p_list) == len(s_list)
            for s, p in zip(s_list, p_list):
                np.testing.assert_array_equal(s.tokens, p.tokens)
                assert s.text == p.text

    def test_base_fallback_matches(self, encdec):
        batches = [np.stack([_noise(seed=5)]), np.stack([_noise(seed=6)])]
        seq = [encdec.transcribe_batch(b) for b in batches]
        pipe = encdec.transcribe_batches(batches)
        for s_list, p_list in zip(seq, pipe):
            for s, p in zip(s_list, p_list):
                np.testing.assert_array_equal(s.tokens, p.tokens)


class TestAudioTransferDtype:
    """int16 shipping (config.audio_transfer_dtype): bit-identical for
    int16-representable audio; float32 mode preserved for parity work."""

    def test_int16_roundtrip_exact(self):
        cfg16 = EngineConfig(
            model="dev.en", max_new_tokens=5, dtype="float32",
            audio_transfer_dtype="int16",
        )
        cfg32 = EngineConfig(
            model="dev.en", max_new_tokens=5, dtype="float32",
            audio_transfer_dtype="float32",
        )
        e16 = Monolith.from_random(cfg16, seed=0)
        e32 = Monolith.from_random(cfg32, seed=0)
        # int16-representable samples (what WAV/PCM sources produce).
        rng = np.random.default_rng(3)
        ints = rng.integers(-3000, 3000, 16_000).astype(np.int16)
        x = ints.astype(np.float32) / 32768.0
        a = e16.transcribe(x)
        b = e32.transcribe(x)
        np.testing.assert_array_equal(a.tokens, b.tokens)


class TestAudioCtxCrop:
    """audio_ctx (post-encoder position crop, config.py): N = n_audio_ctx
    must be exactly the uncropped pipeline; a real crop must run end-to-end
    (incl. beam + serving-shape cross-KV) and change only quality, not
    machinery."""

    def test_full_width_is_noop(self):
        base = EngineConfig(model="dev.en", max_new_tokens=5, dtype="float32")
        full = Monolith.from_random(base, seed=0)
        noop = Monolith.from_random(
            EngineConfig(model="dev.en", max_new_tokens=5, dtype="float32",
                         audio_ctx=1500),
            seed=0,
        )
        x = _noise(seed=9)
        np.testing.assert_array_equal(
            full.transcribe(x).tokens, noop.transcribe(x).tokens
        )

    def test_cropped_runs_beam(self):
        eng = Monolith.from_random(
            EngineConfig(model="dev.en", max_new_tokens=5, dtype="float32",
                         audio_ctx=256, beam_size=2),
            seed=0,
        )
        r = eng.transcribe(_noise(seed=11))
        assert r.length >= 1 and isinstance(r.text, str)


class TestLogitBias:
    """config.logit_bias (the openai-API logit_bias surface): additive
    per-token biases applied on every decode path."""

    def test_eot_bias_shortens_generations(self):
        from whisper_tpu.config import EngineConfig
        from whisper_tpu.engine import EngineType, create_engine

        rng = np.random.default_rng(0)
        samples = (0.1 * rng.standard_normal((2, 16_000))).astype(np.float32)
        base = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", dtype="float32",
                         max_new_tokens=12),
            seed=0,
        )
        eot = base.vocab.specials.eot
        biased = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", dtype="float32",
                         max_new_tokens=12, logit_bias=((eot, 1e9),)),
            seed=0,
        )
        lens_base = [r.length for r in base.transcribe_batch(samples)]
        lens_biased = [r.length for r in biased.transcribe_batch(samples)]
        # An overwhelming EOT boost stops every row at the SECOND step:
        # suppress_blank (on by default) masks EOT at the first sampled
        # position, openai semantics — the bias applies after that.
        p = len(biased._prompt)
        assert all(l == p + 2 for l in lens_biased), lens_biased
        assert all(b >= a for a, b in zip(lens_biased, lens_base))

    def test_beam_path_applies_bias(self):
        from whisper_tpu.config import EngineConfig
        from whisper_tpu.engine import EngineType, create_engine

        rng = np.random.default_rng(1)
        samples = (0.1 * rng.standard_normal((2, 16_000))).astype(np.float32)
        eng = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", dtype="float32",
                         max_new_tokens=8, beam_size=3),
            seed=0,
        )
        eot = eng.vocab.specials.eot
        biased = create_engine(
            EngineType.MONOLITH,
            EngineConfig(model="dev", language="en", dtype="float32",
                         max_new_tokens=8, beam_size=3,
                         logit_bias=((eot, 1e9),)),
            seed=0,
        )
        p = len(biased._prompt)
        for r in biased.transcribe_batch(samples):
            assert r.length == p + 2
        # unbiased engine still decodes normally
        assert all(r.length >= p + 1 for r in eng.transcribe_batch(samples))
