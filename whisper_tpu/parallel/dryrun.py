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
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.config import ModelDims
from whisper_tpu.decode.greedy import greedy_decode
from whisper_tpu.frontend.filters import mel_filterbank
from whisper_tpu.frontend.mel import log_mel_spectrogram
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params
from whisper_tpu.parallel.mesh import make_mesh
from whisper_tpu.parallel.sharding import shard_params


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
    """Create an n-device (data, model) mesh, jit the full
    mel→encode→greedy-decode step under real dp+tp shardings, and execute one
    step on tiny shapes. Raises on any compile/sharding error."""
    devs = _ensure_devices(n_devices)
    mp = 2 if (n_devices % 2 == 0 and n_devices > 1) else 1
    mesh = make_mesh((n_devices // mp, mp), devices=devs)

    dims = ModelDims(
        n_mels=80,
        n_audio_ctx=1500,
        n_audio_state=128,
        n_audio_head=4,
        n_audio_layer=2,
        n_vocab=51_865,
        n_text_ctx=448,
        n_text_state=128,
        n_text_head=4,
        n_text_layer=2,
    )
    params = shard_params(
        init_params(dims, jax.random.PRNGKey(0), dtype=jnp.float32), mesh, dims
    )
    filters = jax.device_put(
        jnp.asarray(mel_filterbank(n_mels=dims.n_mels)),
        NamedSharding(mesh, P()),
    )

    batch = mesh.shape["data"]  # one utterance per data-parallel group
    samples = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (batch, 16_000)) * 0.1,
        NamedSharding(mesh, P("data")),
    )
    prompt = jax.device_put(
        jnp.tile(jnp.array([[50258, 50261, 50360, 50364]], jnp.int32), (batch, 1)),
        NamedSharding(mesh, P("data", None)),
    )

    enc_sharding = NamedSharding(mesh, P("data", None, None))

    @jax.jit
    def step(p, s, f, pr):
        mel = log_mel_spectrogram(s, f, n_mels=dims.n_mels)
        enc_out = encode(p, mel, dims)
        enc_out = jax.lax.with_sharding_constraint(enc_out, enc_sharding)
        tokens, lengths = greedy_decode(
            p, enc_out, pr, dims, eot=50257, max_new_tokens=4
        )
        return tokens, lengths

    tokens, lengths = step(params, samples, filters, prompt)
    jax.block_until_ready(tokens)
    assert tokens.shape == (batch, prompt.shape[1] + 4)
    assert lengths.shape == (batch,)
