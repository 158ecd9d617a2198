"""C-ABI engine binding (native/whisper_engine_capi.cpp): the foreign-caller
surface mirroring the reference's JNI bridge
(bindings/java/whisper.tflite.cpp:17-73) and its Driver.java smoke.

Two call paths are exercised:
* a pure-C driver binary (create → transcribe file → destroy) run as a
  subprocess — a real foreign process embedding Python;
* ctypes from inside this process (the attach-to-existing-interpreter path),
  including the buffer entry point and error reporting.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "build", "libwhisper_engine.so")
DRIVER = os.path.join(REPO, "native", "build", "whisper_driver")


def _can_build() -> bool:
    """Collection-time check stays side-effect free (ADVICE r3 #1): only
    look for existing artifacts or a toolchain; the build itself happens in
    the session fixture below, so it runs only when the (slow-marked) tests
    are actually selected."""
    if os.path.exists(LIB) and os.path.exists(DRIVER):
        return True
    import shutil

    return shutil.which("cmake") is not None


pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not _can_build(), reason="C-ABI engine library not built and no "
        "cmake toolchain available"
    ),
]


@pytest.fixture(scope="session")
def capi_built():
    """Build the C-ABI library + driver on first use; skip on failure."""
    if os.path.exists(LIB) and os.path.exists(DRIVER):
        return True
    try:
        subprocess.run(
            ["cmake", "-S", os.path.join(REPO, "native"), "-B",
             os.path.join(REPO, "native", "build"),
             "-DCMAKE_BUILD_TYPE=Release"],
            check=True, capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", os.path.join(REPO, "native", "build")],
            check=True, capture_output=True,
        )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"C-ABI build failed: {e}")
    if not (os.path.exists(LIB) and os.path.exists(DRIVER)):
        pytest.skip("C-ABI build produced no artifacts")
    return True

CONFIG = (
    '{"model":"dev","language":"en","dtype":"float32",'
    '"max_new_tokens":4,"pythonpath":"%s"}' % REPO
)


def _wav(tmp_path):
    from whisper_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    p = str(tmp_path / "u.wav")
    write_wav(p, (0.1 * rng.standard_normal(12_000)).astype(np.float32))
    return p


@pytest.mark.slow
def test_c_driver_subprocess(tmp_path, capi_built):
    """A real C process drives create/transcribe/destroy end-to-end."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [DRIVER, CONFIG, _wav(tmp_path)],
        env=env, capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip()  # dev vocab emits <|eN|> surfaces — non-empty


@pytest.mark.slow
def test_ctypes_attach_buffer_and_errors(tmp_path, capi_built):
    """Load the library INTO this Python process (attach path), transcribe a
    buffer, and check parity with the in-process engine + error surface."""
    lib = ctypes.CDLL(LIB)
    lib.wh_engine_create.restype = ctypes.c_void_p
    lib.wh_engine_create.argtypes = [ctypes.c_char_p]
    lib.wh_engine_transcribe_buffer.restype = ctypes.c_void_p
    lib.wh_engine_transcribe_buffer.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
    ]
    lib.wh_engine_transcribe_file.restype = ctypes.c_void_p
    lib.wh_engine_transcribe_file.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
    ]
    lib.wh_engine_error.restype = ctypes.c_char_p
    lib.wh_engine_string_free.argtypes = [ctypes.c_void_p]
    lib.wh_engine_destroy.argtypes = [ctypes.c_void_p]

    handle = lib.wh_engine_create(CONFIG.encode())
    assert handle, lib.wh_engine_error().decode()

    rng = np.random.default_rng(0)
    samples = (0.1 * rng.standard_normal(12_000)).astype(np.float32)
    ptr = lib.wh_engine_transcribe_buffer(
        handle,
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples),
    )
    assert ptr, lib.wh_engine_error().decode()
    text = ctypes.string_at(ptr).decode()
    lib.wh_engine_string_free(ptr)

    # Parity with the same engine driven natively from Python.
    from whisper_tpu.config import EngineConfig
    from whisper_tpu.engine import EngineType, create_engine

    eng = create_engine(
        EngineType.MONOLITH,
        EngineConfig(model="dev", language="en", dtype="float32",
                     max_new_tokens=4),
        seed=0,
    )
    assert text == eng.transcribe(samples).text

    # Error surface: bad path → NULL + message, engine still usable.
    bad = lib.wh_engine_transcribe_file(handle, b"/nonexistent.wav")
    assert not bad
    assert lib.wh_engine_error()

    lib.wh_engine_destroy(handle)
