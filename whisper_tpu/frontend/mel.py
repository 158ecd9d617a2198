"""Log-mel spectrogram frontend, TPU-first.

Numeric contract (SURVEY.md §2a, from reference log_mel_spectrogram,
whisper.cpp:109-216):

* sample rate 16 kHz, n_fft 400, hop 160, 80 mels, 30 s chunk → 3000 frames;
* periodic Hann window ``0.5*(1-cos(2πi/400))`` (whisper.cpp:117-120);
* NO center padding; frame *i* reads ``x[160 i : 160 i + 400]`` with zeros past
  the end (whisper.cpp:148-154);
* power spectrum with mirrored bins folded in — equivalent to doubling bins
  1..199 of the one-sided spectrum (whisper.cpp:159-166);
* mel = filterbank · power over 201 bins; ``log10(max(·,1e-10))``; per-utterance
  floor at ``max-8``; affine ``(x+4)/4`` (whisper.cpp:169-213).

TPU design (vs the reference's per-frame recursive FFT on a std::thread pool,
whisper.cpp:58-106,131-194): the 400-point real DFT is a dense 400×402 matmul
— tiny, and the MXU eats it; framing is pure reshape/slice/concat (no gather);
the whole frontend is one fused XLA program over ``[batch, frames]`` so the
reference's frame-level thread parallelism becomes the natural batch dimension
of two matmuls. A fused Pallas kernel lives in mel_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import HOP_LENGTH, N_FFT, N_SAMPLES
from whisper_tpu.frontend.filters import mel_filterbank


def pad_or_trim(samples: jnp.ndarray, length: int = N_SAMPLES) -> jnp.ndarray:
    """Pad with zeros / truncate the last axis to ``length`` — the semantics of
    ``samples.resize(480000, 0)`` in the reference (whisper.cpp:687,698,753)."""
    n = samples.shape[-1]
    if n == length:
        return samples
    if n > length:
        return samples[..., :length]
    pad = [(0, 0)] * (samples.ndim - 1) + [(0, length - n)]
    return jnp.pad(samples, pad)


@functools.lru_cache(maxsize=8)
def _dft_window_matrices(n_fft: int):
    """Windowed real-DFT basis: W_cos, W_sin of shape [n_fft, n_bins].

    The periodic Hann window is folded into the basis so framing output feeds
    straight into one matmul per component. Cached as host numpy (NOT jnp:
    device arrays captured under a jit trace would leak tracers); jnp.asarray
    at the call site embeds them as compile-time constants.
    """
    n_bins = n_fft // 2 + 1
    i = np.arange(n_fft, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / n_fft))  # whisper.cpp:117-120
    k = np.arange(n_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(i, k) / n_fft  # [n_fft, n_bins]
    w_cos = np.cos(ang) * window[:, None]
    w_sin = -np.sin(ang) * window[:, None]
    return w_cos, w_sin


def _frame(signal: jnp.ndarray, n_fft: int, hop: int, n_frames: int) -> jnp.ndarray:
    """[..., n_samples] → [..., n_frames, n_fft] without gathers.

    frame[i, j] = padded[hop*i + j]. With n_fft = c*hop + r we decompose
    j = hop*a + b, so frame[i] is a concat of rows of the hop-strided reshape —
    slices and concats only, which XLA fuses into the downstream matmul's
    operand layout.
    """
    full_chunks, rem = divmod(n_fft, hop)
    # Rows needed in the hop-strided view: n_frames + full_chunks (+1 if rem).
    rows = n_frames + full_chunks + (1 if rem else 0)
    needed = rows * hop
    padded = pad_or_trim(signal, needed)
    strided = padded.reshape(*signal.shape[:-1], rows, hop)
    parts = [
        jax.lax.slice_in_dim(strided, a, a + n_frames, axis=-2)
        for a in range(full_chunks)
    ]
    if rem:
        tail = jax.lax.slice_in_dim(
            strided, full_chunks, full_chunks + n_frames, axis=-2
        )
        parts.append(tail[..., :rem])
    return jnp.concatenate(parts, axis=-1)


def log_mel_spectrogram(
    samples: jnp.ndarray,
    filters: Optional[jnp.ndarray] = None,
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """``[..., n_samples] → [..., n_mels, n_frames]`` log-mel features.

    ``n_frames = n_samples // hop`` (whisper.cpp:123): for the canonical
    480,000-sample chunk that's 3,000 frames. Output layout matches the
    reference's ``[n_mel][n_len]`` row-major buffer (whisper.cpp:184).
    """
    if filters is None:
        filters = jnp.asarray(mel_filterbank(n_fft=n_fft, n_mels=n_mels))
    else:
        filters = jnp.asarray(filters)
    n_frames = samples.shape[-1] // hop
    x = samples.astype(compute_dtype)

    frames = _frame(x, n_fft, hop, n_frames)  # [..., F, n_fft]
    w_cos_np, w_sin_np = _dft_window_matrices(n_fft)
    w_cos = jnp.asarray(w_cos_np, dtype=compute_dtype)
    w_sin = jnp.asarray(w_sin_np, dtype=compute_dtype)

    re = frames @ w_cos  # [..., F, n_bins]
    im = frames @ w_sin
    power = re * re + im * im

    # Fold of mirrored bins (whisper.cpp:159-166): for real input the full
    # 400-point spectrum satisfies |X[n_fft-j]| == |X[j]|, so the fold doubles
    # bins 1..n_fft/2-1 and leaves DC and Nyquist alone.
    n_bins = n_fft // 2 + 1
    fold = np.ones((n_bins,), dtype=np.float32)
    fold[1:-1] = 2.0
    power = power * jnp.asarray(fold, dtype=power.dtype)

    mel = power @ filters.astype(power.dtype).T  # [..., F, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))

    # Per-utterance dynamic-range clamp (whisper.cpp:196-213): max over the
    # full [F, n_mels] plane of each leading-batch element.
    mmax = jnp.max(log_spec, axis=(-1, -2), keepdims=True)
    log_spec = jnp.maximum(log_spec, mmax - 8.0)
    log_spec = (log_spec + 4.0) / 4.0

    return jnp.swapaxes(log_spec, -1, -2)  # [..., n_mels, F]
