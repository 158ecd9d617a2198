"""Logit rules: suppression and timestamp constraints as masked adds.

The reference computes a ``suppress`` variable and never applies it
(whisper.cpp:382-383 — SURVEY.md §2a.13), so its decodes run ruleless; its
exported monolith graphs inherit whatever rules HF baked in. Here the rules
are first-class and jit-compatible: every rule is an additive mask on the
[B, V] logits, with the sequence-dependent timestamp rules reading the fixed
-shape token buffer — no dynamic shapes, no host round-trips.

Rule set (mirrors the public Whisper decoding semantics):
* static suppression: non-speech symbol tokens + [sot, prev, solm] (+ not_
  when timestamps are on);
* blank suppression at the first sampled position (" " and EOT);
* timestamp grammar: timestamps come in pairs (a text span sits between
  them), are monotonically non-decreasing, the first sampled token may be
  constrained to a timestamp, an initial-timestamp cap applies, and when the
  total timestamp probability mass beats the best text token a timestamp is
  forced.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.tokenizer.vocab import Vocab

NEG_INF = -1e30

# Public Whisper non-speech symbol inventory.
_SYMBOLS = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』') + (
    '<< >> <<< >>> -- --- -( -[ (\' (" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪'.split()
)
_MISC = set("♩♪♫♬♭♮♯")


def nonspeech_token_ids(vocab: Vocab) -> Tuple[int, ...]:
    """IDs whose surface is a standalone non-speech symbol (optionally
    space-prefixed), plus any token *starting* with a music symbol — the
    surface-table equivalent of the encoder-based construction in public
    Whisper (we only hold id→bytes, not a BPE encoder)."""
    wanted = set()
    exact = set()
    for s in _SYMBOLS:
        exact.add(s.encode("utf-8"))
        exact.add((" " + s).encode("utf-8"))
    misc_prefixes = tuple(m.encode("utf-8") for m in _MISC)
    for tid in range(vocab.specials.eot):
        surf = vocab.id_to_token.get(tid)
        if surf is None:
            continue
        if surf in exact or surf in (b" -", b" '"):
            wanted.add(tid)
        elif misc_prefixes and surf.lstrip(b" ").startswith(misc_prefixes):
            wanted.add(tid)
    return tuple(sorted(wanted))


def blank_token_ids(vocab: Vocab) -> Tuple[int, ...]:
    ids = [tid for tid, s in vocab.id_to_token.items() if s == b" "]
    return tuple(ids)


@dataclasses.dataclass(frozen=True)
class LogitRules:
    """Precomputed rule tables; all jnp work happens in apply()."""

    n_vocab: int
    eot: int
    sot: int
    not_: int
    beg: int
    static_bias: np.ndarray  # [V] float32, NEG_INF at suppressed ids
    blank_bias: np.ndarray  # [V] extra bias at the first sampled position
    timestamps: bool = False
    max_initial_timestamp_index: int = 50  # 1.0 s at 0.02 s precision

    def apply(
        self,
        logits: jnp.ndarray,  # [B, V] float32
        tokens: jnp.ndarray,  # [B, L] fixed-shape buffer
        pos: jnp.ndarray,  # scalar int32 (shared) or [B] int32 (per-row):
        # position being sampled — the vector form serves continuous
        # batching, where every slot decodes at its own depth
        sample_begin: jnp.ndarray,  # scalar int32: first sampled position
    ) -> jnp.ndarray:
        pos = jnp.broadcast_to(jnp.asarray(pos), (logits.shape[0],))
        logits = logits + jnp.asarray(self.static_bias)
        is_first = (pos == sample_begin)[:, None]
        logits = logits + jnp.where(
            is_first, jnp.asarray(self.blank_bias), 0.0
        )
        if self.timestamps:
            logits = self._timestamp_rules(logits, tokens, pos, sample_begin)
        return logits

    # --- timestamp grammar --------------------------------------------------
    def _timestamp_rules(self, logits, tokens, pos, sample_begin):
        # ``pos`` arrives as [B] (normalized by apply()).
        v = self.n_vocab
        beg, eot = self.beg, self.eot
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
        is_ts = ids >= beg
        is_text = ids < eot  # excludes eot and all specials/timestamps

        rows = jnp.arange(tokens.shape[0])
        last = tokens[rows, jnp.maximum(pos - 1, 0)]
        penult = tokens[rows, jnp.maximum(pos - 2, 0)]
        last_was_ts = (pos - 1 >= sample_begin) & (last >= beg)
        penult_was_ts = (pos - 2 >= sample_begin) & (penult >= beg)

        # Pairing: after  <ts> <ts>  → no timestamp; after text <ts> → no text.
        mask_ts = last_was_ts & penult_was_ts
        mask_text = last_was_ts & ~penult_was_ts
        bias = jnp.where(mask_ts[:, None] & is_ts, NEG_INF, 0.0)
        bias = bias + jnp.where(mask_text[:, None] & is_text, NEG_INF, 0.0)

        # Monotonicity: timestamps never decrease. Largest timestamp so far:
        sampled_mask = (
            jax.lax.broadcasted_iota(jnp.int32, tokens.shape, 1) < pos[:, None]
        ) & (tokens >= beg)
        max_ts = jnp.max(
            jnp.where(sampled_mask, tokens, beg - 1), axis=1
        )  # [B]
        bias = bias + jnp.where(
            is_ts & (ids < jnp.maximum(max_ts, beg)[:, None]), NEG_INF, 0.0
        )

        # First sampled token must be a timestamp, capped at the initial max.
        is_first = (pos == sample_begin)[:, None]
        first_bias = jnp.where(~is_ts, NEG_INF, 0.0) + jnp.where(
            ids > beg + self.max_initial_timestamp_index, NEG_INF, 0.0
        )
        # EOT stays legal at the first position.
        first_bias = jnp.where(ids == eot, 0.0, first_bias)
        bias = bias + jnp.where(is_first, first_bias, 0.0)

        logits = logits + bias

        # Force a timestamp when total timestamp mass beats the best text
        # token (the openai "timestamp_logprob > max_text_token_logprob" rule).
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_mass = jax.nn.logsumexp(
            jnp.where(is_ts, logprobs, NEG_INF), axis=-1
        )  # [B]
        best_text = jnp.max(jnp.where(is_text, logprobs, NEG_INF), axis=-1)
        force_ts = ts_mass > best_text
        logits = logits + jnp.where(
            force_ts[:, None] & ~is_ts & (ids != eot), NEG_INF, 0.0
        )
        return logits


def make_rules(
    vocab: Vocab,
    timestamps: bool = False,
    suppress_blank: bool = True,
    suppress_nonspeech: bool = True,
    extra_suppress: Sequence[int] = (),
    max_initial_timestamp_index: int = 50,
    n_vocab: Optional[int] = None,
) -> LogitRules:
    st = vocab.specials
    v = n_vocab or max(vocab.id_to_token.keys()) + 1

    static = np.zeros((v,), dtype=np.float32)
    suppressed = set(extra_suppress)
    # Specials that must never be sampled mid-transcript — openai
    # decoding.py's _get_suppress_tokens: [transcribe, translate, sot,
    # sot_prev, sot_lm] plus no_speech when the tokenizer has one.
    suppressed |= {
        st.sot, st.prev, st.solm, st.transcribe, st.translate, st.nospeech,
    }
    if suppress_nonspeech:
        suppressed |= set(nonspeech_token_ids(vocab))
    if timestamps:
        suppressed.add(st.not_)
    for tid in suppressed:
        if tid < v:
            static[tid] = NEG_INF

    blank = np.zeros((v,), dtype=np.float32)
    if suppress_blank:
        for tid in blank_token_ids(vocab):
            if tid < v:
                blank[tid] = NEG_INF
        blank[st.eot] = NEG_INF

    return LogitRules(
        n_vocab=v,
        eot=st.eot,
        sot=st.sot,
        not_=st.not_,
        beg=st.beg,
        static_bias=static,
        blank_bias=blank,
        timestamps=timestamps,
        max_initial_timestamp_index=max_initial_timestamp_index,
    )
