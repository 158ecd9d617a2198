"""Mel frontend numeric-contract tests (SURVEY.md §2a items 1-7).

The oracle below is an *independent* per-frame numpy implementation written
directly from the documented contract (periodic Hann, no center padding,
zero-fill past the end, mirrored-bin fold, log10 → max-8 floor → (x+4)/4),
evaluated in float64. The JAX frontend must match it elementwise.
"""

import numpy as np
import pytest

from whisper_tpu.config import HOP_LENGTH, N_FFT, N_FRAMES, N_SAMPLES
from whisper_tpu.frontend import log_mel_spectrogram, mel_filterbank, pad_or_trim


def oracle_log_mel(samples: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Straight-line float64 transcription of the §2a contract."""
    n = len(samples)
    n_frames = n // HOP_LENGTH
    n_bins = N_FFT // 2 + 1
    i = np.arange(N_FFT)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / N_FFT))
    mel = np.zeros((filters.shape[0], n_frames))
    for f in range(n_frames):
        frame = np.zeros(N_FFT)
        start = f * HOP_LENGTH
        avail = max(0, min(N_FFT, n - start))
        frame[:avail] = samples[start : start + avail]
        spec = np.fft.fft(frame * window)  # full 400-point FFT
        power = np.abs(spec) ** 2
        folded = power[:n_bins].copy()
        # fold mirrored bins: folded[j] += power[N_FFT - j], j in 1..199
        # (whisper.cpp:159-166)
        folded[1 : n_bins - 1] += power[N_FFT - 1 : n_bins - 1 : -1]
        mel[:, f] = filters.astype(np.float64) @ folded
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


@pytest.fixture(scope="module")
def filters():
    return mel_filterbank()


def _signal(seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16_000 * seconds)
    t = np.arange(n) / 16_000
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    return x.astype(np.float32)


class TestLogMel:
    def test_matches_oracle_short(self, filters):
        x = _signal(seconds=0.5)
        got = np.asarray(log_mel_spectrogram(x, filters))
        want = oracle_log_mel(x.astype(np.float64), filters)
        assert got.shape == want.shape == (80, 50)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)

    def test_matches_oracle_full_chunk(self, filters):
        x = pad_or_trim(_signal(seconds=2.0))
        x = np.asarray(x)
        got = np.asarray(log_mel_spectrogram(x, filters))
        want = oracle_log_mel(x.astype(np.float64), filters)
        assert got.shape == (80, N_FRAMES)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)

    def test_tail_frames_zero_filled(self, filters):
        # Frames whose window extends past the signal end read zeros
        # (whisper.cpp:148-154) — last frame starts at 479,840 and covers
        # only 160 real samples.
        x = np.asarray(pad_or_trim(_signal(seconds=30.0)))
        assert x.shape[-1] == N_SAMPLES
        got = np.asarray(log_mel_spectrogram(x, filters))
        want = oracle_log_mel(x.astype(np.float64), filters)
        np.testing.assert_allclose(got[:, -3:], want[:, -3:], atol=2e-4, rtol=0)

    def test_batched_matches_single(self, filters):
        xs = np.stack([_signal(seed=s) for s in range(3)])
        got = np.asarray(log_mel_spectrogram(xs, filters))
        for b in range(3):
            single = np.asarray(log_mel_spectrogram(xs[b], filters))
            np.testing.assert_allclose(got[b], single, atol=1e-6)

    def test_silence_normalization(self, filters):
        # All-zero input: mel=1e-10 everywhere → log10=-10 → floored at
        # max-8=-18? No: max is -10, floor -18, so value stays -10 → (x+4)/4.
        x = np.zeros(16_000, dtype=np.float32)
        got = np.asarray(log_mel_spectrogram(x, filters))
        np.testing.assert_allclose(got, (-10.0 + 4.0) / 4.0, atol=1e-5)

    def test_output_range_normalized(self, filters):
        x = _signal(seconds=1.0)
        got = np.asarray(log_mel_spectrogram(x, filters))
        # After floor at max-8 and (x+4)/4, spread is exactly ≤ 2.0.
        assert got.max() - got.min() <= 2.0 + 1e-6


class TestPadOrTrim:
    def test_pad(self):
        x = np.ones(100, dtype=np.float32)
        y = np.asarray(pad_or_trim(x, 250))
        assert y.shape == (250,)
        assert y[:100].sum() == 100 and y[100:].sum() == 0

    def test_trim(self):
        x = np.arange(500, dtype=np.float32)
        y = np.asarray(pad_or_trim(x, 250))
        np.testing.assert_array_equal(y, x[:250])

    def test_batched(self):
        x = np.ones((2, 100), dtype=np.float32)
        assert pad_or_trim(x, N_SAMPLES).shape == (2, N_SAMPLES)


class TestFilterbank:
    def test_shape_and_rowsums(self):
        fb = mel_filterbank()
        assert fb.shape == (80, 201)
        assert fb.min() >= 0
        # Every filter has support.
        assert (fb.sum(axis=1) > 0).all()

    def test_large_v3_shape(self):
        assert mel_filterbank(n_mels=128).shape == (128, 201)

    def test_matches_librosa_if_available(self):
        librosa = pytest.importorskip("librosa")
        ref = librosa.filters.mel(sr=16_000, n_fft=400, n_mels=80)
        np.testing.assert_allclose(mel_filterbank(), ref, atol=1e-7)


class TestFusedPallasMel:
    """mel_pallas.py parity vs the jnp path (interpret mode on CPU; the
    compiled kernel is exercised on real TPU by the engine/bench paths)."""

    def test_matches_jnp_path(self, rng):
        import jax.numpy as jnp

        from whisper_tpu.frontend.mel import log_mel_spectrogram
        from whisper_tpu.frontend.mel_pallas import log_mel_spectrogram_fused

        x = jnp.asarray(rng.normal(size=(2, N_SAMPLES)).astype(np.float32) * 0.1)
        ref = np.asarray(log_mel_spectrogram(x))
        fused = np.asarray(log_mel_spectrogram_fused(x, interpret=True))
        assert fused.shape == ref.shape == (2, 80, 3000)
        np.testing.assert_allclose(fused, ref, atol=2e-4)

    def test_unbatched_and_128_mels(self, rng):
        import jax.numpy as jnp

        from whisper_tpu.frontend.mel import log_mel_spectrogram
        from whisper_tpu.frontend.mel_pallas import log_mel_spectrogram_fused

        x = jnp.asarray(rng.normal(size=(N_SAMPLES,)).astype(np.float32) * 0.1)
        fused = np.asarray(log_mel_spectrogram_fused(x, n_mels=128, interpret=True))
        assert fused.shape == (128, 3000)
        filters = mel_filterbank(n_mels=128)
        ref = np.asarray(log_mel_spectrogram(x, jnp.asarray(filters), n_mels=128))
        np.testing.assert_allclose(fused, ref, atol=2e-4)

    def test_rejects_wrong_length(self):
        import jax.numpy as jnp
        import pytest

        from whisper_tpu.frontend.mel_pallas import log_mel_spectrogram_fused

        with pytest.raises(ValueError):
            log_mel_spectrogram_fused(jnp.zeros((2, 16000)))
