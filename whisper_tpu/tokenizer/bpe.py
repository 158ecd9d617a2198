"""Byte-level BPE text **encoder**: text → token IDs.

The reference only ever decodes (``decode()``, whisper.cpp:634-665) because
its prompts are hardcoded token IDs; openai-whisper's user surface, though,
takes *text* (``initial_prompt``, hot-words) and tokenizes it. This module
closes that gap using only the data the framework already ships: the
``Vocab``'s id→bytes table.

Why no merges file is needed: Whisper's tokenizers are tiktoken-format BPE
(multilingual.tiktoken / gpt2.tiktoken), where a token's *id is its merge
rank* — ids 0..255-ish are the byte alphabet and every later id was minted
in merge order. Byte-pair encoding can therefore run directly against the
bytes→id map: repeatedly merge the adjacent pair whose concatenation has the
lowest id (tiktoken's ``byte_pair_merge``). This reproduces the canonical
encoding for any rank-ordered byte-level BPE vocab, which is exactly what
both the reference's ``.bin`` (id-ordered surfaces) and our HF conversion
produce.

Pre-tokenization uses GPT-2's split pattern (shared by every Whisper
tokenizer); the ``regex`` module supplies the ``\\p{L}``/``\\p{N}`` classes.
"""

from __future__ import annotations

from typing import List, Sequence

import regex as _regex

from whisper_tpu.tokenizer.vocab import Vocab

# GPT-2 / Whisper pre-tokenization pattern (public BPE convention).
_PAT = _regex.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
    r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


def _byte_pair_merge(piece: bytes, ranks, max_rank: int) -> List[int]:
    """tiktoken-style BPE over one pre-tokenized piece.

    ``parts`` holds the boundaries of the current segmentation; each round
    merges the adjacent pair whose concatenated bytes have the lowest rank
    (< max_rank), until no pair is mergeable. Returns the token ids.
    """
    parts = list(range(len(piece) + 1))  # segment boundaries

    def pair_rank(i: int) -> int:
        seg = piece[parts[i] : parts[i + 2]]
        r = ranks.get(seg)
        return r if r is not None and r < max_rank else _NO_RANK

    while len(parts) > 2:
        best_i, best_r = -1, _NO_RANK
        for i in range(len(parts) - 2):
            r = pair_rank(i)
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0:
            break
        del parts[best_i + 1]

    out = []
    for a, b in zip(parts[:-1], parts[1:]):
        seg = piece[a:b]
        tid = ranks.get(seg)
        if tid is None:
            raise ValueError(
                f"byte sequence {seg!r} has no token in this vocab — the "
                "vocab is not a complete byte-level BPE table"
            )
        out.append(tid)
    return out


_NO_RANK = 1 << 62


def encode_text(vocab: Vocab, text: str) -> List[int]:
    """Encode ``text`` to token IDs (no special tokens added).

    Only non-special ids (< eot) participate as merge ranks; special
    surfaces like ``<|transcribe|>`` in the table can never match because
    the pre-tokenizer splits their punctuation apart.
    """
    ranks = vocab.token_to_id
    max_rank = vocab.specials.eot
    ids: List[int] = []
    for m in _PAT.finditer(text):
        piece = m.group().encode("utf-8")
        whole = ranks.get(piece)
        if whole is not None and whole < max_rank:
            ids.append(whole)
            continue
        ids.extend(_byte_pair_merge(piece, ranks, max_rank))
    return ids


def encode_initial_prompt(vocab: Vocab, prompt: str) -> List[int]:
    """openai-whisper's ``initial_prompt`` tokenization: a leading space is
    forced before the stripped text (transcribe.py:
    ``tokenizer.encode(" " + initial_prompt.strip())``). Cropping to the
    last ``n_text_ctx//2 - 1`` tokens happens in decode/prompt.build_prompt.
    """
    return encode_text(vocab, " " + prompt.strip())
