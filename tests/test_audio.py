"""Audio I/O + VAD behavior tests (reference wav_util.cpp, app/vad.cpp,
app/silent_detection.cpp)."""

import struct

import numpy as np
import pytest

from whisper_tpu.audio import (
    energy_vad,
    frame_energies,
    read_pcm_f32,
    read_wav,
    read_wav_legacy,
    remove_silence,
    speech_segments,
    write_wav,
)
from whisper_tpu.audio.vad import FRAME_SIZE


def _tone(seconds=0.5, amp=0.5, hz=440, sr=16_000):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


class TestWav:
    def test_pcm16_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.wav")
        x = _tone()
        write_wav(p, x)
        y = read_wav(p)
        assert y.dtype == np.float32
        # int16 quantization bound: 1/32767.
        np.testing.assert_allclose(y, x, atol=1.5 / 32767)

    def test_legacy_reader_matches(self, tmp_path):
        p = str(tmp_path / "t.wav")
        x = _tone()
        write_wav(p, x)
        np.testing.assert_array_equal(read_wav(p), read_wav_legacy(p))

    def test_float32_wav(self, tmp_path):
        # IEEE-float WAV (format 3) — wav_read_legacy's float path
        # (wav_util.cpp:78-81).
        p = str(tmp_path / "f32.wav")
        x = _tone()
        data = x.astype("<f4").tobytes()
        with open(p, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16_000, 64_000, 4, 32))
            f.write(b"data" + struct.pack("<I", len(data)) + data)
        np.testing.assert_allclose(read_wav(p), x, atol=1e-7)

    def test_stereo_downmix_default_correct(self, tmp_path):
        p = str(tmp_path / "st.wav")
        left = np.full(100, 0.5, dtype=np.float32)
        right = np.full(100, -0.1, dtype=np.float32)
        pcm = np.empty(200, dtype="<i2")
        pcm[0::2] = (left * 32767).astype("<i2")
        pcm[1::2] = (right * 32767).astype("<i2")
        data = pcm.tobytes()
        with open(p, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16_000, 64_000, 4, 16))
            f.write(b"data" + struct.pack("<I", len(data)) + data)
        y = read_wav(p)
        np.testing.assert_allclose(y, (0.5 - 0.1) / 2, atol=1e-3)
        # Quirk mode reproduces the reference's /INT32_MAX downmix
        # (wav_util.cpp:122-126) — near-silence.
        yq = read_wav(p, reference_quirks=True)
        assert np.abs(yq).max() < 1e-4

    def test_wrong_sample_rate_raises(self, tmp_path):
        p = str(tmp_path / "sr.wav")
        write_wav(p, _tone(), sample_rate=8_000)
        with pytest.raises(ValueError, match="sample rate"):
            read_wav(p)

    def test_raw_pcm(self, tmp_path):
        p = str(tmp_path / "x.raw")
        x = _tone()
        x.astype("<f4").tofile(p)
        np.testing.assert_array_equal(read_pcm_f32(p), x)


class TestVad:
    def test_energy_threshold(self):
        # Loud then silent: frames classified per vad.cpp:37-41.
        loud = _tone(seconds=0.1, amp=0.5)
        quiet = np.zeros(FRAME_SIZE * 3, dtype=np.float32)
        x = np.concatenate([loud, quiet])
        mask = energy_vad(x)
        assert mask[0] and not mask[-1]

    def test_frame_energy_is_rms(self):
        x = np.full(FRAME_SIZE, 0.25, dtype=np.float32)
        np.testing.assert_allclose(frame_energies(x), [0.25], atol=1e-6)

    def test_partial_frame_dropped(self):
        x = np.ones(FRAME_SIZE + 10, dtype=np.float32)
        assert len(frame_energies(x)) == 1

    def test_remove_silence(self):
        loud = _tone(seconds=0.2, amp=0.5)
        silent = np.zeros(FRAME_SIZE * 5, dtype=np.float32)
        x = np.concatenate([loud, silent])
        out = remove_silence(x)
        # All fully-loud frames kept, all fully-silent frames dropped; the one
        # straddling frame may legitimately be kept (its RMS is > -35 dB).
        n_full_loud = len(loud) // FRAME_SIZE
        assert n_full_loud * FRAME_SIZE <= len(out) <= (n_full_loud + 1) * FRAME_SIZE
        assert not np.any(out[-FRAME_SIZE:] == 0.0) or len(out) == 0 or (
            np.abs(out).max() > 0
        )

    def test_speech_segments(self):
        sil = np.zeros(FRAME_SIZE * 20, dtype=np.float32)
        sp = _tone(seconds=FRAME_SIZE * 10 / 16_000, amp=0.5)
        x = np.concatenate([sil, sp, sil, sp, sil])
        segs = speech_segments(x, min_silence_frames=5)
        assert len(segs) == 2
        for start, end in segs:
            assert energy_vad(x[start:end]).mean() > 0.9
