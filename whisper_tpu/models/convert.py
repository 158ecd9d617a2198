"""Checkpoint conversion: HF / openai-whisper weights → whisper-tpu pytree.

Replaces the reference's entire model-production layer (SURVEY.md §2 rows
28-29): where the reference detours HF → SavedModel → TFLite
(export/generate.py) or torch → ONNX → onnx-tf → TFLite ×2
(export/generate_onnx.py), a TPU framework needs no graph export at all —
only the *weights*, renamed and transposed into the param pytree of
models/params.py. The graph is ours, compiled by XLA.

Two source dialects:
* HuggingFace ``WhisperForConditionalGeneration`` state dicts
  (``model.encoder.layers.N.self_attn.q_proj.weight`` …);
* openai-whisper ``.pt`` checkpoints
  (``encoder.blocks.N.attn.query.weight`` …, with a ``dims`` header).

All torch ``Linear`` weights are [out, in] and transpose to our [in, out];
conv1d weights are [out, in, width] → [width, in, out]. Transformer blocks
stack along a leading layer axis (lax.scan layout).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from whisper_tpu.config import MODEL_DIMS, ModelDims
from whisper_tpu.models.params import Params


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor, cpu()-safe
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    key = f"{prefix}.bias"
    if bias and key in sd and sd[key] is not None:
        p["b"] = _np(sd[key])
    return p


def _ln(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"g": _np(sd[f"{prefix}.weight"]), "b": _np(sd[f"{prefix}.bias"])}


def _conv(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "w": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def _stack(layer_dicts):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layer_dicts)


def _finalize(params: Params) -> Params:
    """numpy staging → jnp leaves (device arrays; required for indexing by
    traced values inside the decode while_loop)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


# --------------------------------------------------------------------------
# HuggingFace dialect
# --------------------------------------------------------------------------
def dims_from_hf_config(cfg) -> ModelDims:
    return ModelDims(
        n_mels=cfg.num_mel_bins,
        n_audio_ctx=cfg.max_source_positions,
        n_audio_state=cfg.d_model,
        n_audio_head=cfg.encoder_attention_heads,
        n_audio_layer=cfg.encoder_layers,
        n_vocab=cfg.vocab_size,
        n_text_ctx=cfg.max_target_positions,
        n_text_state=cfg.d_model,
        n_text_head=cfg.decoder_attention_heads,
        n_text_layer=cfg.decoder_layers,
    )


def from_hf_state_dict(sd: Mapping[str, Any], dims: ModelDims) -> Params:
    def attn(prefix: str) -> Dict:
        return {
            "q": _linear(sd, f"{prefix}.q_proj"),
            "k": _linear(sd, f"{prefix}.k_proj", bias=False),
            "v": _linear(sd, f"{prefix}.v_proj"),
            "o": _linear(sd, f"{prefix}.out_proj"),
        }

    enc_blocks = []
    for i in range(dims.n_audio_layer):
        pre = f"model.encoder.layers.{i}"
        enc_blocks.append(
            {
                "ln1": _ln(sd, f"{pre}.self_attn_layer_norm"),
                "attn": attn(f"{pre}.self_attn"),
                "ln2": _ln(sd, f"{pre}.final_layer_norm"),
                "mlp": {
                    "fc1": _linear(sd, f"{pre}.fc1"),
                    "fc2": _linear(sd, f"{pre}.fc2"),
                },
            }
        )

    dec_blocks = []
    for i in range(dims.n_text_layer):
        pre = f"model.decoder.layers.{i}"
        dec_blocks.append(
            {
                "ln1": _ln(sd, f"{pre}.self_attn_layer_norm"),
                "attn": attn(f"{pre}.self_attn"),
                "ln2": _ln(sd, f"{pre}.encoder_attn_layer_norm"),
                "cross": attn(f"{pre}.encoder_attn"),
                "ln3": _ln(sd, f"{pre}.final_layer_norm"),
                "mlp": {
                    "fc1": _linear(sd, f"{pre}.fc1"),
                    "fc2": _linear(sd, f"{pre}.fc2"),
                },
            }
        )

    return _finalize({
        "encoder": {
            "conv1": _conv(sd, "model.encoder.conv1"),
            "conv2": _conv(sd, "model.encoder.conv2"),
            "blocks": _stack(enc_blocks),
            "ln_post": _ln(sd, "model.encoder.layer_norm"),
        },
        "decoder": {
            "tok_emb": _np(sd["model.decoder.embed_tokens.weight"]),
            "pos_emb": _np(sd["model.decoder.embed_positions.weight"]),
            "blocks": _stack(dec_blocks),
            "ln": _ln(sd, "model.decoder.layer_norm"),
        },
    })


# --------------------------------------------------------------------------
# openai-whisper dialect
# --------------------------------------------------------------------------
def dims_from_openai(dims_dict: Mapping[str, int]) -> ModelDims:
    return ModelDims(
        n_mels=dims_dict["n_mels"],
        n_audio_ctx=dims_dict["n_audio_ctx"],
        n_audio_state=dims_dict["n_audio_state"],
        n_audio_head=dims_dict["n_audio_head"],
        n_audio_layer=dims_dict["n_audio_layer"],
        n_vocab=dims_dict["n_vocab"],
        n_text_ctx=dims_dict["n_text_ctx"],
        n_text_state=dims_dict["n_text_state"],
        n_text_head=dims_dict["n_text_head"],
        n_text_layer=dims_dict["n_text_layer"],
    )


def from_openai_state_dict(sd: Mapping[str, Any], dims: ModelDims) -> Params:
    def attn(prefix: str) -> Dict:
        return {
            "q": _linear(sd, f"{prefix}.query"),
            "k": _linear(sd, f"{prefix}.key", bias=False),
            "v": _linear(sd, f"{prefix}.value"),
            "o": _linear(sd, f"{prefix}.out"),
        }

    def block(pre: str, cross: bool) -> Dict:
        d = {
            "ln1": _ln(sd, f"{pre}.attn_ln"),
            "attn": attn(f"{pre}.attn"),
        }
        if cross:
            d["ln2"] = _ln(sd, f"{pre}.cross_attn_ln")
            d["cross"] = attn(f"{pre}.cross_attn")
            d["ln3"] = _ln(sd, f"{pre}.mlp_ln")
        else:
            d["ln2"] = _ln(sd, f"{pre}.mlp_ln")
        d["mlp"] = {
            "fc1": _linear(sd, f"{pre}.mlp.0"),
            "fc2": _linear(sd, f"{pre}.mlp.2"),
        }
        return d

    enc_blocks = [
        block(f"encoder.blocks.{i}", cross=False) for i in range(dims.n_audio_layer)
    ]
    dec_blocks = [
        block(f"decoder.blocks.{i}", cross=True) for i in range(dims.n_text_layer)
    ]

    return _finalize({
        "encoder": {
            "conv1": _conv(sd, "encoder.conv1"),
            "conv2": _conv(sd, "encoder.conv2"),
            "blocks": _stack(enc_blocks),
            "ln_post": _ln(sd, "encoder.ln_post"),
        },
        "decoder": {
            "tok_emb": _np(sd["decoder.token_embedding.weight"]),
            "pos_emb": _np(sd["decoder.positional_embedding"]),
            "blocks": _stack(dec_blocks),
            "ln": _ln(sd, "decoder.ln"),
        },
    })


# --------------------------------------------------------------------------
# Entry point
# --------------------------------------------------------------------------
def load_checkpoint(path: str) -> Tuple[Params, ModelDims]:
    """Load a checkpoint: our ``.npz`` interchange file or Orbax directory
    (utils/checkpoint.py), openai-whisper ``.pt`` (torch.load dict with
    'dims' + 'model_state_dict'), or a HF directory/repo (requires
    transformers)."""
    import os

    if path.endswith(".npz"):
        from whisper_tpu.utils.checkpoint import load_params

        return load_params(path)
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "dims.json")):
        from whisper_tpu.utils.checkpoint import load_params_orbax

        return load_params_orbax(path)
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        dims = dims_from_openai(ckpt["dims"])
        return from_openai_state_dict(ckpt["model_state_dict"], dims), dims

    from transformers import WhisperForConditionalGeneration

    model = WhisperForConditionalGeneration.from_pretrained(path)
    dims = dims_from_hf_config(model.config)
    return from_hf_state_dict(model.state_dict(), dims), dims
