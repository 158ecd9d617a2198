"""Spoken-language identification from the decoder's SOT-position logits.

A capability the reference lacks entirely — it hardcodes ``"de"`` into the
decoder prompt (reference whisper.cpp:327-339, "expected sequence [50258,
50261, 50359, 50363]"). Whisper's decoder natively predicts the language
token right after ``<|startoftranscript|>``, so detection is one extra
prefill of length 1 against the already-computed cross-attention K/V: feed
``[sot]``, restrict the next-token logits to the language-token block
``[sot+1, sot+1+n_langs)``, argmax.

``n_langs`` is 99 for the 51865-token multilingual vocab and 100 for
large-v3's 51866 (which appends ``<|yue|>`` — tokenizer/languages.py keeps
the full table in canonical order, so token ↔ code mapping is positional).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from whisper_tpu.config import ModelDims, N_VOCAB_LARGE_V3
from whisper_tpu.models.decoder import (
    KVCache,
    decoder_prefill,
    init_kv_cache,
    precompute_cross_kv,
)
from whisper_tpu.models.params import Params
from whisper_tpu.tokenizer.languages import lang_code


def n_langs_for(dims: ModelDims) -> int:
    return 100 if dims.n_vocab >= N_VOCAB_LARGE_V3 else 99


def detect_language_tokens(
    params: Params,
    enc_out: jnp.ndarray,  # [B, n_audio_ctx, d]
    dims: ModelDims,
    sot: int,
    compute_dtype=jnp.float32,
    cross_kv: Optional[KVCache] = None,
    return_probs: bool = False,
) -> jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns language token ids [B] int32 (and, optionally, the softmax
    distribution over the language block [B, n_langs])."""
    b = enc_out.shape[0]
    if cross_kv is None:
        cross_kv = precompute_cross_kv(params, enc_out, dims)
    cache = init_kv_cache(dims, b, 1, dtype=compute_dtype)
    prompt = jnp.full((b, 1), sot, jnp.int32)
    logits, _ = decoder_prefill(params, prompt, cache, cross_kv, dims, compute_dtype)
    lang_base = sot + 1
    block = jax.lax.dynamic_slice_in_dim(
        logits[:, 0, :], lang_base, n_langs_for(dims), axis=-1
    )
    tokens = (lang_base + jnp.argmax(block, axis=-1)).astype(jnp.int32)
    if return_probs:
        return tokens, jax.nn.softmax(block, axis=-1)
    return tokens


def lang_token_to_code(token: int, sot: int) -> str:
    """Host-side: language token id → ISO code ("" if out of range)."""
    lid = int(token) - sot - 1
    if 0 <= lid < 100:
        return lang_code(lid)
    return ""
