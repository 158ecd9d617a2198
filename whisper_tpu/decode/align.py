"""Word-level timestamps: DTW over cross-attention alignment.

The reference has no notion of word timing (its decode emits text only,
whisper.cpp:634-665); openai-whisper's ``timing.py`` established the
standard recipe, which this module reimplements TPU-first:

1. a **teacher-forced alignment forward** over the final token sequence
   (one batched jit program — not a decode loop) that computes each layer's
   cross-attention *weights*, z-normalizes them per head over the token
   axis, and averages the selected alignment heads **inside the graph**, so
   the only thing leaving the device is one [B, T_text, T_audio] matrix —
   never the [L, H, T_text, T_audio] stack (for large-v3 that stack is
   ~1.7 GB/utterance; the reduced matrix is ~2.7 MB);
2. host-side median filtering along the audio axis and a classic
   dynamic-time-warping pass over the negative matrix (token/frame path);
3. token→word grouping on byte surfaces (a new word starts on a leading
   space), mapping DTW frame indices to seconds (1 encoder position =
   20 ms).

Alignment heads: openai ships a per-checkpoint head mask discovered
empirically; when none is configured we default to *all heads of the upper
half of the decoder stack* — the region openai's published masks
concentrate in.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import ModelDims
from whisper_tpu.models import layers
from whisper_tpu.models.decoder import KVCache
from whisper_tpu.models.params import Params

# One encoder position covers two 10 ms mel hops (conv stem stride 2).
SECONDS_PER_POSITION = 0.02

NEG_INF = -1e30


@dataclass
class Word:
    word: str
    start: float  # seconds into the 30 s window
    end: float
    tokens: List[int]


def default_alignment_mask(dims: ModelDims) -> np.ndarray:
    """[L, H] bool — upper half of the decoder stack, all heads."""
    mask = np.zeros((dims.n_text_layer, dims.n_text_head), bool)
    mask[dims.n_text_layer // 2 :, :] = True
    return mask


def heads_to_mask(
    heads: Sequence[Tuple[int, int]], dims: ModelDims
) -> np.ndarray:
    mask = np.zeros((dims.n_text_layer, dims.n_text_head), bool)
    for l, h in heads:
        mask[l, h] = True
    return mask


def alignment_matrix(
    params: Params,
    tokens: jnp.ndarray,  # [B, T] int32 — the FULL decoded rows (prompt incl.)
    cross_kv: KVCache,  # [L, B, H, Dh, Ta]
    dims: ModelDims,
    head_mask: jnp.ndarray,  # [L, H] bool
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Teacher-forced forward → head-averaged z-normed cross-attention
    alignment matrix [B, T, Ta] float32.

    Mirrors openai-whisper ``find_alignment``: weights are the decoder's
    cross-attention softmax probabilities; per selected head they are
    standardized over the token axis ((w-μ)/σ per frame column), then
    averaged. Self-attention here is plain causal attention over the
    sequence — no KV cache, since the whole sequence is known."""
    dec = params["decoder"]
    n_head = dims.n_text_head
    b, t = tokens.shape
    dh = dims.n_text_state // n_head

    pos_emb = dec["pos_emb"][:t]
    x = (layers.embed(dec["tok_emb"], tokens) + pos_emb).astype(compute_dtype)

    causal = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        <= jax.lax.broadcasted_iota(jnp.int32, (t, t), 0),
        0.0,
        NEG_INF,
    ).astype(compute_dtype)

    n_sel = jnp.maximum(jnp.sum(head_mask.astype(jnp.float32)), 1.0)

    def block(carry, xs):
        h, acc = carry
        bp, xk_l, xv_l, mask_l = xs

        hn = layers.layer_norm(bp["ln1"], h)
        q = layers.split_heads(layers.linear(bp["attn"]["q"], hn), n_head)
        k = layers.split_heads(layers.linear(bp["attn"]["k"], hn), n_head)
        v = layers.split_heads(layers.linear(bp["attn"]["v"], hn), n_head)
        attn_out = layers.qkv_attention(q, k, v, causal)
        h = h + layers.linear(bp["attn"]["o"], layers.merge_heads(attn_out))

        hn = layers.layer_norm(bp["ln2"], h)
        qx = layers.split_heads(layers.linear(bp["cross"]["q"], hn), n_head)
        kT = xk_l.astype(qx.dtype) if xk_l.dtype.itemsize == 1 else xk_l
        vT = xv_l.astype(qx.dtype) if xv_l.dtype.itemsize == 1 else xv_l
        qt = jnp.swapaxes(qx, 1, 2)  # [B, H, T, Dh]
        scores = jnp.einsum(
            "bhqd,bhdk->bhqk", qt, kT, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * (1.0 / float(dh) ** 0.5)
        w = jax.nn.softmax(scores, axis=-1)  # [B, H, T, Ta]

        # z-norm per head over the TOKEN axis (openai timing.py std_mean
        # dim=-2), mask to the selected heads, accumulate the head-sum.
        mean = jnp.mean(w, axis=2, keepdims=True)
        std = jnp.std(w, axis=2, keepdims=True)
        z = (w - mean) / (std + 1e-9)
        acc = acc + jnp.einsum("bhqk,h->bqk", z, mask_l.astype(jnp.float32))

        cross_out = jnp.swapaxes(
            jnp.einsum(
                "bhqk,bhdk->bhqd",
                w.astype(vT.dtype),
                vT,
                preferred_element_type=jnp.float32,
            ),
            1,
            2,
        ).astype(h.dtype)
        h = h + layers.linear(bp["cross"]["o"], layers.merge_heads(cross_out))
        h = h + layers.mlp(bp["mlp"], layers.layer_norm(bp["ln3"], h))
        return (h, acc), None

    ta = cross_kv["k"].shape[-1]
    acc0 = jnp.zeros((b, t, ta), jnp.float32)
    xs = (dec["blocks"], cross_kv["k"], cross_kv["v"], head_mask)
    (_, acc), _ = jax.lax.scan(block, (x, acc0), xs)
    return acc / n_sel


def median_filter(matrix: np.ndarray, width: int = 7) -> np.ndarray:
    """Median over a sliding window along the last (audio) axis, edges
    padded by reflection — openai timing.py's medfilt."""
    if width <= 1:
        return matrix
    pad = width // 2
    padded = np.pad(matrix, [(0, 0)] * (matrix.ndim - 1) + [(pad, pad)],
                    mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW over cost [T_text, T_audio] → (text_idx, time_idx)
    path, both non-decreasing, covering every text row. Classic O(N·M) DP
    with steps (−1,−1), (−1,0), (0,−1) (openai timing.py dtw)."""
    n, m = cost.shape
    D = np.full((n + 1, m + 1), np.inf, dtype=np.float64)
    D[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), dtype=np.int8)
    for i in range(1, n + 1):
        row_c = cost[i - 1]
        for j in range(1, m + 1):
            c0 = D[i - 1, j - 1]
            c1 = D[i - 1, j]
            c2 = D[i, j - 1]
            if c0 <= c1 and c0 <= c2:
                D[i, j] = c0 + row_c[j - 1]
                trace[i, j] = 0
            elif c1 <= c2:
                D[i, j] = c1 + row_c[j - 1]
                trace[i, j] = 1
            else:
                D[i, j] = c2 + row_c[j - 1]
                trace[i, j] = 2
    i, j = n, m
    text_idx, time_idx = [], []
    while i > 0 or j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        step = trace[i, j]
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(text_idx[::-1]), np.asarray(time_idx[::-1])


def token_boundaries(
    text_idx: np.ndarray, time_idx: np.ndarray, n_tokens: int
) -> np.ndarray:
    """Per-token (start_frame, end_frame): first/last audio index the DTW
    path assigns to each text row."""
    bounds = np.zeros((n_tokens, 2), np.int64)
    for tok in range(n_tokens):
        sel = time_idx[text_idx == tok]
        if len(sel):
            bounds[tok] = sel[0], sel[-1] + 1
        elif tok > 0:
            bounds[tok] = bounds[tok - 1, 1], bounds[tok - 1, 1]
    return bounds


def split_words(vocab, token_ids: Sequence[int]) -> List[Tuple[str, List[int]]]:
    """Group text tokens into words on byte surfaces: a token whose surface
    starts with a space (or that begins the stream) starts a new word.
    Special tokens are skipped (they carry no surface time)."""
    eot = vocab.specials.eot
    words: List[Tuple[bytearray, List[int]]] = []
    for pos, tid in enumerate(token_ids):
        tid = int(tid)
        if tid >= eot:
            continue
        surface = vocab.surface(tid)
        if not words or surface.startswith(b" "):
            words.append((bytearray(surface), [pos]))
        else:
            words[-1][0].extend(surface)
            words[-1][1].append(pos)
    return [
        (buf.decode("utf-8", errors="replace").strip(), idxs)
        for buf, idxs in words
        if buf.strip()
    ]


def words_from_alignment(
    vocab,
    tokens: np.ndarray,  # [total_len] int32, prompt included
    length: int,
    p_len: int,
    matrix: np.ndarray,  # [T, Ta] raw alignment (tokens axis = full row)
    n_frames: Optional[int] = None,  # valid encoder positions (None = all)
    medfilt_width: int = 7,
) -> List[Word]:
    """Full host-side pipeline: trim → filter → DTW → token bounds → words."""
    gen = np.asarray(tokens[p_len:length], dtype=np.int64)
    if gen.size == 0:
        return []
    sub = matrix[p_len:length]
    if n_frames is not None:
        sub = sub[:, : max(int(n_frames), 2)]
    sub = median_filter(sub, medfilt_width)
    text_idx, time_idx = dtw_path(-sub.astype(np.float64))
    bounds = token_boundaries(text_idx, time_idx, len(gen))
    out: List[Word] = []
    for word, idxs in split_words(vocab, gen):
        start = bounds[idxs[0], 0] * SECONDS_PER_POSITION
        end = bounds[idxs[-1], 1] * SECONDS_PER_POSITION
        out.append(
            Word(word=word, start=float(start), end=float(end),
                 tokens=[int(gen[i]) for i in idxs])
        )
    return out
