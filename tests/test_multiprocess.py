"""Two-process jax.distributed test (SURVEY.md §4 "multi-host tests via
jax.distributed"; VERDICT round-1 missing #5: multihost.initialize had never
run with >1 process).

Spawns two REAL processes on localhost — each with 4 virtual CPU devices —
that join one coordinator, build an (8, 1) global mesh through the public
create_engine surface, shard a 4-file batch per host (each process decodes
only its 2 files), run one SPMD transcription, and allgather results. Both
processes must produce the same full result list, token-identical to a
plain single-process engine.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from whisper_tpu.config import EngineConfig
from whisper_tpu.engine import EngineType, create_engine

WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_engine_token_parity(tmp_path):
    from whisper_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, (0.1 * rng.standard_normal(12_000)).astype(np.float32))
        paths.append(p)

    # Ground truth: plain single-process, unsharded engine.
    plain = create_engine(
        EngineType.MONOLITH,
        EngineConfig(model="dev", language="en", max_new_tokens=4,
                     dtype="float32"),
        seed=0,
    )
    expected = [
        {
            "tokens": [int(t) for t in r.tokens[: r.length]],
            "text": r.text,
            "temperature": r.temperature,
        }
        for r in plain.transcribe_files(paths)
    ]

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"proc{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, WORKER,
                    "--coordinator", coordinator,
                    "--num-processes", "2",
                    "--process-id", str(pid),
                    "--paths", ",".join(paths),
                    "--out", out,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    logs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=540)
        logs.append((p.returncode, stdout[-2000:], stderr[-2000:]))
    assert all(rc == 0 for rc, *_ in logs), logs

    datas = [json.load(open(o)) for o in outs]
    assert [d["process_index"] for d in datas] == [0, 1]
    assert all(d["n_devices"] == 8 for d in datas), datas
    # Every process holds the full result list; both match the ground truth.
    assert datas[0]["results"] == datas[1]["results"]
    assert datas[0]["results"] == expected
    # Uneven-shard probe: a 1-path pass (host 1 contributes ZERO files) must
    # still decode path 0 to the same tokens on every host.
    assert (
        datas[0]["probe_single"]
        == datas[1]["probe_single"]
        == expected[0]["tokens"]
    )


@pytest.mark.slow
def test_two_process_temperature_fallback(tmp_path):
    """The multi-process temperature-fallback path (engine._mp_pass retry
    subsets): an unclearable logprob gate forces every row through the retry
    ladder; both processes must produce identical results stamped with the
    ladder's final temperature."""
    from whisper_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, (0.1 * rng.standard_normal(12_000)).astype(np.float32))
        paths.append(p)

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"fb{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, WORKER,
                    "--coordinator", coordinator,
                    "--num-processes", "2",
                    "--process-id", str(pid),
                    "--paths", ",".join(paths),
                    "--out", out,
                    "--fallback",
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    logs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=540)
        logs.append((p.returncode, stdout[-2000:], stderr[-2000:]))
    assert all(rc == 0 for rc, *_ in logs), logs

    datas = [json.load(open(o)) for o in outs]
    assert datas[0]["results"] == datas[1]["results"]
    # The gate can never pass, so openai semantics keep the LAST attempt:
    # every row must carry the ladder's final temperature.
    assert all(r["temperature"] == 0.5 for r in datas[0]["results"]), datas[0]
