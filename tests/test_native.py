"""Native host runtime (native/whisper_host.cpp) vs numpy reference parity.

The C++ layer must be semantically identical to audio/wav.py and audio/vad.py
— bit-for-bit where float op order allows (PCM16 scaling, frame RMS, VAD
masks), and to tight tolerance where intermediates differ (log10 at frame
boundaries). Builds the library in-session; skips if no toolchain.
"""

import numpy as np
import pytest

from whisper_tpu.audio.vad import energy_vad, frame_energies, remove_silence
from whisper_tpu.audio.wav import (
    read_pcm_f32,
    read_wav,
    read_wav_legacy,
    write_wav,
)


@pytest.fixture(scope="module")
def native():
    try:
        from whisper_tpu.native.build import build

        build()
    except Exception as e:  # no toolchain in this environment
        pytest.skip(f"native build unavailable: {e}")
    from whisper_tpu.native import load_native

    load_native.cache_clear()
    host = load_native()
    if host is None:
        pytest.skip("native library did not load")
    return host


@pytest.fixture()
def speechy(rng):
    # bursts of tone separated by near-silence: exercises VAD both ways
    sr = 16_000
    x = rng.normal(size=sr * 2).astype(np.float32) * 0.002
    t = np.arange(sr // 2) / sr
    burst = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    x[1000 : 1000 + len(burst)] += burst
    x[20000 : 20000 + len(burst)] += burst
    return x


class TestWavParity:
    def test_mono_pcm16(self, native, tmp_path, speechy):
        p = str(tmp_path / "m.wav")
        write_wav(p, speechy)
        np.testing.assert_array_equal(native.read_wav(p), read_wav(p))

    def test_stereo_pcm16_and_quirk(self, native, tmp_path, rng):
        import struct

        p = str(tmp_path / "s.wav")
        pcm = (rng.normal(size=32000) * 8000).astype("<i2")
        data = pcm.tobytes()
        with open(p, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16))
            f.write(b"data" + struct.pack("<I", len(data)) + data)
        np.testing.assert_array_equal(native.read_wav(p), read_wav(p))
        np.testing.assert_array_equal(
            native.read_wav(p, reference_quirks=True),
            read_wav(p, reference_quirks=True),
        )

    def test_float32_wav(self, native, tmp_path, rng):
        import struct

        p = str(tmp_path / "f.wav")
        x = rng.normal(size=16000).astype("<f4")
        data = x.tobytes()
        with open(p, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32))
            f.write(b"data" + struct.pack("<I", len(data)) + data)
        np.testing.assert_array_equal(native.read_wav(p), read_wav(p))

    def test_legacy(self, native, tmp_path, speechy):
        p = str(tmp_path / "l.wav")
        write_wav(p, speechy)
        np.testing.assert_array_equal(native.read_wav_legacy(p), read_wav_legacy(p))

    def test_pcm_f32(self, native, tmp_path, speechy):
        p = str(tmp_path / "x.pcm")
        speechy.astype("<f4").tofile(p)
        np.testing.assert_array_equal(native.read_pcm_f32(p), read_pcm_f32(p))

    def test_wrong_rate_rejected(self, native, tmp_path, speechy):
        p = str(tmp_path / "r.wav")
        write_wav(p, speechy, sample_rate=8000)
        with pytest.raises(ValueError, match="sample rate"):
            native.read_wav(p)

    def test_garbage_rejected(self, native, tmp_path):
        p = str(tmp_path / "g.wav")
        with open(p, "wb") as f:
            f.write(b"not a wav at all")
        with pytest.raises(ValueError):
            native.read_wav(p)


class TestVadParity:
    def test_frame_energies(self, native, speechy):
        np.testing.assert_allclose(
            native.frame_energies(speechy), frame_energies(speechy), rtol=1e-7
        )

    def test_vad_mask(self, native, speechy):
        np.testing.assert_array_equal(
            native.energy_vad(speechy), energy_vad(speechy)
        )

    def test_remove_silence(self, native, speechy):
        np.testing.assert_array_equal(
            native.remove_silence(speechy), remove_silence(speechy)
        )

    def test_empty(self, native):
        x = np.zeros(10, np.float32)
        assert native.frame_energies(x).size == 0
        assert native.remove_silence(x).size == 0


class TestBatchLoader:
    def test_parallel_decode_pad(self, native, tmp_path, rng):
        paths = []
        refs = []
        for i in range(6):
            x = rng.normal(size=8000 + 1000 * i).astype(np.float32) * 0.1
            p = str(tmp_path / f"b{i}.wav")
            write_wav(p, x)
            paths.append(p)
            refs.append(read_wav(p))
        batch = native.load_batch(paths, max_len=16000, n_threads=3)
        assert batch.shape == (6, 16000)
        for i, r in enumerate(refs):
            np.testing.assert_array_equal(batch[i, : len(r)], r)
            assert not batch[i, len(r) :].any()

    def test_truncates_long(self, native, tmp_path, rng):
        x = rng.normal(size=20000).astype(np.float32) * 0.1
        p = str(tmp_path / "long.wav")
        write_wav(p, x)
        batch = native.load_batch([p], max_len=1000)
        np.testing.assert_array_equal(batch[0], read_wav(p)[:1000])

    def test_strict_failure(self, native, tmp_path):
        with pytest.raises(ValueError, match="cannot open"):
            native.load_batch([str(tmp_path / "missing.wav")], max_len=100)

    def test_non_strict_zero_fills(self, native, tmp_path, speechy):
        good = str(tmp_path / "ok.wav")
        write_wav(good, speechy)
        batch = native.load_batch(
            [str(tmp_path / "nope.wav"), good], max_len=4000, strict=False
        )
        assert not batch[0].any()
        np.testing.assert_array_equal(batch[1], read_wav(good)[:4000])
