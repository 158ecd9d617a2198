"""Multi-chip dry run: compile + execute the full sharded pipeline on an
N-device mesh (virtual CPU devices in CI, real chips in production).

Exercises the parallelism inventory from SURVEY.md §2b:
* **dp** — utterance batch sharded over the ``data`` axis;
* **tp** — Megatron-style head/MLP sharding over the ``model`` axis
  (param_pspecs), logits contraction psum included;
* **sp/ep** — intentionally absent: Whisper's sequence length is
  architecturally fixed at 1500 encoder positions / 448 text positions
  (whisper.h:38-39), so the sequence-scaling story is VAD-chunk fan-out into
  the batch (dp), and there is no MoE. Documented here so the omission is a
  design decision, not a gap;
* **pp** — encode/decode disaggregation is the pipeline story for inference
  (EncDec engine); inter-layer pp is unnecessary at whisper scale.
"""

from __future__ import annotations

import os

import jax


def _ensure_devices(n_devices: int):
    """Return ``n_devices`` jax devices, falling back to virtual CPU devices.

    A sitecustomize may import jax and register a single-chip backend before
    the caller's ``JAX_PLATFORMS``/``XLA_FLAGS`` env vars can take effect
    (making them no-ops). If the live backend is short on devices, re-pin the
    platform to CPU with ``xla_force_host_platform_device_count`` — the same
    fake-cluster capability SURVEY.md §4 calls for — and retry."""
    # Backends freeze at the first jax.devices() call, so any platform pin
    # must happen *before* we look. If the caller asked for virtual CPU
    # devices (the fake-cluster flag SURVEY.md §4 calls for), pin CPU now —
    # a sitecustomize may have rewritten $JAX_PLATFORMS to its own
    # single-chip platform, making the caller's env var a silent no-op.
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already up; fall through to the live device list
    devs = jax.devices()
    if len(devs) >= n_devices:
        return devs[:n_devices]
    # Last resort: no force-flag present but too few devices — try CPU.
    try:
        jax.config.update("jax_platforms", "cpu")
        devs = jax.devices()
    except RuntimeError:
        pass
    if len(devs) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devs)} "
            f"(platform={devs[0].platform}); run with JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
            "in a fresh process"
        )
    return devs[:n_devices]


def dryrun_multichip(n_devices: int) -> None:
    """Stand up the PRODUCT surface on an n-device (data, model) mesh —
    ``create_engine`` with ``mesh_shape`` in the config, exactly what a user
    gets from the CLI's ``--mesh`` flag — and execute the full sharded
    pipeline (mel → encode → KV-cached decode) for both greedy and beam
    engines on tiny shapes. Raises on any compile/sharding error."""
    import numpy as np

    from whisper_tpu.config import EngineConfig
    from whisper_tpu.engine import EngineType, create_engine

    _ensure_devices(n_devices)
    mp = 2 if (n_devices % 2 == 0 and n_devices > 1) else 1
    mesh_shape = (n_devices // mp, mp)

    batch = mesh_shape[0]  # one utterance per data-parallel group
    rng = np.random.default_rng(0)
    samples = (0.1 * rng.standard_normal((batch, 16_000))).astype(np.float32)

    # Greedy monolith: the headline single-program path under dp+tp.
    eng = create_engine(
        EngineType.MONOLITH,
        EngineConfig(
            model="dev", language="de", max_new_tokens=4, dtype="float32",
            mesh_shape=mesh_shape,
        ),
        seed=0,
    )
    if n_devices > 1:
        assert eng.mesh is not None and dict(eng.mesh.shape) == {
            "data": mesh_shape[0], "model": mesh_shape[1],
        }
    else:
        # A (1, 1) mesh is the degenerate single-chip case: the engine skips
        # the mesh machinery entirely (engine.py gates on prod(mesh_shape)>1),
        # which is the correct product behavior — no sharding overhead.
        assert eng.mesh is None
    results = eng.transcribe_batch(samples)
    assert len(results) == batch
    assert all(r.length >= 4 for r in results)

    # Beam engine: exercises the beam-state gathers + shared cross-KV
    # grouping under the same shardings (BASELINE.json configs[2]).
    beam_eng = create_engine(
        EngineType.MONOLITH,
        EngineConfig(
            model="dev", language="de", max_new_tokens=4, beam_size=2,
            dtype="float32", mesh_shape=mesh_shape,
        ),
        seed=0,
    )
    beam_results = beam_eng.transcribe_batch(samples)
    assert len(beam_results) == batch
