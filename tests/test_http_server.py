"""HTTP serving front-end (engine/http_server.py): request decode, the
transcriber hand-off, error isolation, and metrics — all on the dev model
over the in-process ThreadingHTTPServer."""

import io
import json
import struct
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from whisper_tpu.config import EngineConfig
from whisper_tpu.engine import EngineType, create_engine
from whisper_tpu.engine.http_server import TranscribeServer


def _wav_bytes(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    out = io.BytesIO()
    out.write(b"RIFF")
    out.write(struct.pack("<I", 36 + len(data)))
    out.write(b"WAVE")
    out.write(b"fmt ")
    out.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                          sample_rate * 2, 2, 16))
    out.write(b"data")
    out.write(struct.pack("<I", len(data)))
    out.write(data)
    return out.getvalue()


@pytest.fixture(scope="module")
def engine():
    return create_engine(
        EngineType.MONOLITH,
        EngineConfig(model="dev", language="en", max_new_tokens=4,
                     dtype="float32"),
        seed=0,
    )


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(3)
    return (0.1 * rng.standard_normal(16_000)).astype(np.float32)


def _post(url, body, ctype="audio/wav"):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


class TestServer:
    def test_sync_mode_roundtrip(self, engine, audio):
        with TranscribeServer(engine, port=0, mode="sync") as srv:
            base = f"http://{srv.host}:{srv.port}"
            code, health = _get(base + "/healthz")
            assert code == 200 and health["status"] == "ok"
            code, out = _post(base + "/transcribe", _wav_bytes(audio))
            assert code == 200
            assert isinstance(out["text"], str) and out["length"] >= 4
            assert out["language"] == "en"
            code, metrics = _get(base + "/metrics")
            assert code == 200 and metrics["requests"] == 1
            assert metrics["errors"] == 0

    def test_raw_pcm_content_type(self, engine, audio):
        with TranscribeServer(engine, port=0, mode="sync") as srv:
            base = f"http://{srv.host}:{srv.port}"
            code, out = _post(
                base + "/transcribe", audio.astype("<f4").tobytes(),
                ctype="application/octet-stream+pcm",
            )
            assert code == 200 and out["length"] >= 4

    def test_matches_direct_engine(self, engine, audio):
        direct = engine.transcribe(audio)
        with TranscribeServer(engine, port=0, mode="sync") as srv:
            _, out = _post(
                f"http://{srv.host}:{srv.port}/transcribe", _wav_bytes(audio)
            )
        # PCM16 container quantization: decode the same quantized samples
        quant = np.frombuffer(_wav_bytes(audio)[44:], dtype="<i2").astype(
            np.float32
        ) / 32767.0
        again = engine.transcribe(quant)
        assert out["text"] == again.clean_text()
        assert out["length"] == again.length
        assert direct.length >= 4  # engine itself sane

    def test_bad_body_is_400_and_isolated(self, engine, audio):
        with TranscribeServer(engine, port=0, mode="sync") as srv:
            base = f"http://{srv.host}:{srv.port}"
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(base + "/transcribe", b"not a wav at all")
            assert ei.value.code == 400
            # server survives: a good request still works
            code, out = _post(base + "/transcribe", _wav_bytes(audio))
            assert code == 200
            _, metrics = _get(base + "/metrics")
            assert metrics["errors"] == 1 and metrics["requests"] == 2

    def test_unknown_route_404(self, engine):
        with TranscribeServer(engine, port=0, mode="sync") as srv:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _get(f"http://{srv.host}:{srv.port}/nope")
            assert ei.value.code == 404

    def test_continuous_mode_concurrent(self, engine, audio):
        rng = np.random.default_rng(9)
        clips = [
            (0.1 * rng.standard_normal(8_000 + 2_000 * i)).astype(np.float32)
            for i in range(4)
        ]
        with TranscribeServer(engine, port=0, mode="continuous",
                              n_slots=2) as srv:
            base = f"http://{srv.host}:{srv.port}"
            results = [None] * len(clips)
            errors = []

            def hit(i):
                try:
                    results[i] = _post(
                        base + "/transcribe", _wav_bytes(clips[i])
                    )
                except Exception as exc:  # pragma: no cover
                    errors.append(exc)

            threads = [
                threading.Thread(target=hit, args=(i,))
                for i in range(len(clips))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert not errors
            assert all(r is not None and r[0] == 200 for r in results)
            _, metrics = _get(base + "/metrics")
            assert metrics["requests"] == len(clips)
            assert "occupancy" in metrics

    def test_async_mode(self, engine, audio):
        with TranscribeServer(engine, port=0, mode="async",
                              max_batch=2) as srv:
            code, out = _post(
                f"http://{srv.host}:{srv.port}/transcribe", _wav_bytes(audio)
            )
            assert code == 200 and out["length"] >= 4


class TestWavBytes:
    def test_read_wav_bytes_matches_file_reader(self, tmp_path, audio):
        from whisper_tpu.audio.wav import read_wav, read_wav_bytes

        blob = _wav_bytes(audio)
        p = tmp_path / "a.wav"
        p.write_bytes(blob)
        np.testing.assert_array_equal(read_wav(str(p)), read_wav_bytes(blob))
