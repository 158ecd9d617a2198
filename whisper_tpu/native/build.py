"""Build the native host library: ``python -m whisper_tpu.native.build``.

Tries CMake+Ninja first (the reference's build system shape, reference
CMakeLists.txt + scripts/build.sh:1-13), falling back to a direct g++
invocation — the library is a single self-contained TU either way.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys


def repo_native_dir() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(os.path.dirname(here)), "native")


def build(force: bool = False, asan: bool = False) -> str:
    """Build (if needed) and return the path to libwhisper_host.so."""
    src_dir = repo_native_dir()
    src = os.path.join(src_dir, "whisper_host.cpp")
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    build_dir = os.path.join(src_dir, "build")
    out = os.path.join(build_dir, "libwhisper_host.so")
    if os.path.exists(out) and not force:
        if os.path.getmtime(out) >= os.path.getmtime(src):
            return out
    os.makedirs(build_dir, exist_ok=True)

    cmake = shutil.which("cmake")
    if cmake:
        gen = ["-G", "Ninja"] if shutil.which("ninja") else []
        cfg = [cmake, "-S", src_dir, "-B", build_dir, *gen,
               "-DCMAKE_BUILD_TYPE=Release"]
        if asan:
            cfg.append("-DWITH_ASAN=ON")
        subprocess.run(cfg, check=True, capture_output=True)
        subprocess.run([cmake, "--build", build_dir], check=True,
                       capture_output=True)
        if os.path.exists(out):
            return out

    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        raise RuntimeError("no C++ compiler found")
    cmd = [gxx, "-std=c++17", "-O3", "-shared", "-fPIC",
           "-fvisibility=hidden", "-Wall", "-Wextra", src, "-o", out,
           "-lpthread"]
    if asan:
        cmd.insert(1, "-fsanitize=address,undefined")
    subprocess.run(cmd, check=True, capture_output=True)
    return out


if __name__ == "__main__":
    path = build(force="--force" in sys.argv, asan="--asan" in sys.argv)
    print(path)
