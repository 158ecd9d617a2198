"""Vocabulary + special-token model.

Reproduces the reference's ``Vocab`` (whisper.h:44-94): the English-model
special-token IDs, the multilingual "+1 shift" transform
(``transform_vocab_multilingual``, whisper.cpp:218-226), and the synthesis of
surface forms for special tokens missing from a vocab file
(``Reader::read_vocab``, whisper.cpp:578-604).

Token-ID arithmetic here is a hard numeric contract (SURVEY.md §2a.8):
the decoder prompt is ``[sot, sot+1+language_id(lang), task, notimestamps]``
and the task tokens are *not* shifted by the multilingual transform.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional

from whisper_tpu.config import N_VOCAB_ENGLISH
from whisper_tpu.tokenizer.languages import LANGUAGES, lang_code


@dataclasses.dataclass
class SpecialTokens:
    """Special-token IDs. Defaults are the English-model values
    (whisper.h:34-42); ``shifted()`` applies the multilingual transform."""

    eot: int = 50256
    sot: int = 50257
    translate: int = 50358
    transcribe: int = 50359
    prev: int = 50360
    solm: int = 50361
    not_: int = 50362  # <|notimestamps|>
    beg: int = 50363  # first timestamp token <|0.00|>

    def shifted(self) -> "SpecialTokens":
        """Multilingual shift: every special ID moves up by 1
        (reference transform_vocab_multilingual, whisper.cpp:218-226 —
        note the reference does NOT shift translate/transcribe there, but
        then uses unshifted 50359 in the prompt; the true multilingual
        model has translate=50358+1=50359, transcribe=50360, sot=50258.
        We model the *actual* multilingual token table and keep a
        ``reference_quirks`` switch in the decode layer for bit-parity
        with the reference's hardcoded prompt [50258, lang, 50359, 50363]
        at whisper.cpp:331-339.)"""
        return SpecialTokens(
            eot=self.eot + 1,
            sot=self.sot + 1,
            translate=self.translate + 1,
            transcribe=self.transcribe + 1,
            prev=self.prev + 1,
            solm=self.solm + 1,
            not_=self.not_ + 1,
            beg=self.beg + 1,
        )

    def lang_token(self, language_id: int) -> int:
        """Language token = sot + 1 + index in the language table
        (reference: ``50259 + language_id`` with sot=50258,
        whisper.cpp:326-329)."""
        return self.sot + 1 + language_id


def special_tokens_for(multilingual: bool) -> SpecialTokens:
    st = SpecialTokens()
    return st.shifted() if multilingual else st


class Vocab:
    """ID ↔ surface-byte-string table plus special IDs.

    Surfaces are ``bytes``: Whisper's BPE merges operate on a unicode
    remapping, but stored vocab surfaces (both in the reference's ``.bin``
    and after our HF conversion) are the raw decoded bytes, concatenated
    directly by the detokenizer (reference decode(), whisper.cpp:640-654).
    """

    def __init__(
        self,
        id_to_token: Dict[int, bytes],
        multilingual: bool,
        n_vocab: Optional[int] = None,
    ):
        self.multilingual = multilingual
        self.specials = special_tokens_for(multilingual)
        self.id_to_token: Dict[int, bytes] = dict(id_to_token)
        self.n_vocab = (
            n_vocab if n_vocab is not None else N_VOCAB_ENGLISH + int(multilingual)
        )
        self._fill_missing_specials()
        self.token_to_id: Dict[bytes, int] = {
            tok: i for i, tok in self.id_to_token.items()
        }

    # Surface synthesis for special IDs absent from the file, mirroring the
    # reference's fallback strings (whisper.cpp:578-604). These exact strings
    # only appear in output when omit_special_tokens=False, matching the
    # reference byte-for-byte there too.
    def _fill_missing_specials(self) -> None:
        st = self.specials
        expected = N_VOCAB_ENGLISH + int(self.multilingual)
        total = max(self.n_vocab, expected)
        for i in range(total):
            if i in self.id_to_token:
                continue
            if i > st.beg:
                word = f"<|TT{i - st.beg}|>"
            elif i == st.eot:
                word = "<|endoftranscript|>"
            elif i == st.sot:
                word = "<|startoftranscript_|>"
            elif i == st.prev:
                word = "<|PREV|>"
            elif i == st.not_:
                word = "<|notimestamps|>"
            elif i == st.beg:
                word = "<|timestampbegin|>"
            elif i == st.translate:
                word = "<|translate|>"
            elif i == st.transcribe:
                word = "<|transcribe|>"
            elif st.sot < i < st.translate:
                lid = i - (st.sot + 1)
                if lid < len(LANGUAGES):
                    word = f"<|lang-{lang_code(lid)}|>"
                else:
                    word = f"<|e{i}|>"
            else:
                word = f"<|e{i}|>"
            self.id_to_token[i] = word.encode("utf-8")

    # --- lookups -----------------------------------------------------------
    def surface(self, token_id: int) -> bytes:
        return self.id_to_token[token_id]

    def is_special(self, token_id: int) -> bool:
        """Reference policy: "special" means ``id >= token_eot``
        (decode() guard ``id < vocab.token_eot``, whisper.cpp:648)."""
        return token_id >= self.specials.eot

    # --- constructors ------------------------------------------------------
    @classmethod
    def synthetic(cls, multilingual: bool = False, n_base: int = 256) -> "Vocab":
        """Small deterministic vocab for tests: base tokens are single bytes,
        specials synthesized. Not a real BPE vocab."""
        table = {i: bytes([i]) for i in range(n_base)}
        return cls(table, multilingual=multilingual, n_vocab=n_base)

    @classmethod
    def from_hf_tokenizer(cls, tokenizer, multilingual: bool) -> "Vocab":
        """Build from a HuggingFace WhisperTokenizer (byte-level BPE).

        Converts the tokenizer's unicode-remapped vocab strings back to raw
        bytes. Replaces the reference's offline vocab-bin pipeline
        (export + app/writeout.cpp) for environments with HF assets.
        """
        byte_decoder = _bytes_to_unicode_inverse()
        table: Dict[int, bytes] = {}
        for tok_str, idx in tokenizer.get_vocab().items():
            if tok_str.startswith("<|") and tok_str.endswith("|>"):
                table[idx] = tok_str.encode("utf-8")
            else:
                try:
                    table[idx] = bytes(byte_decoder[c] for c in tok_str)
                except KeyError:
                    table[idx] = tok_str.encode("utf-8")
        return cls(table, multilingual=multilingual, n_vocab=len(table))


def _bytes_to_unicode_inverse() -> Dict[str, int]:
    """Inverse of GPT-2's bytes↔unicode remapping (public BPE convention)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}
