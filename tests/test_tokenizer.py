"""Tokenizer/vocab/language-table contract tests (SURVEY.md §2a.8, §2 rows 6-8)."""

import numpy as np
import pytest

from whisper_tpu.config import N_VOCAB_ENGLISH, N_VOCAB_MULTILINGUAL
from whisper_tpu.tokenizer import (
    LANGUAGES,
    Vocab,
    decode_tokens,
    lang_code,
    language_id,
    remove_extra_spaces,
)
from whisper_tpu.tokenizer.binfmt import read_bin, write_bin
from whisper_tpu.tokenizer.vocab import special_tokens_for


class TestLanguages:
    def test_table_size(self):
        assert len(LANGUAGES) == 100  # whisper.cpp:405-508

    def test_canonical_order_prefix(self):
        # First rows of the canonical Whisper ordering.
        assert [c for c, _ in LANGUAGES[:8]] == [
            "en", "zh", "de", "es", "ru", "ko", "fr", "ja",
        ]

    def test_german_id_gives_50261(self):
        # Reference: decoder lang token = 50259 + language_id("de") = 50261
        # (whisper.cpp:326-339).
        st = special_tokens_for(multilingual=True)
        assert st.lang_token(language_id("de")) == 50261

    def test_roundtrip(self):
        for i, (code, _) in enumerate(LANGUAGES):
            assert language_id(code) == i
            assert lang_code(i) == code

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            language_id("xx")

    def test_lookup_by_name(self):
        assert language_id("german") == language_id("de")


class TestSpecialTokens:
    """Pinned against the actual openai tokenizer layouts (eot, sot,
    languages×N, translate, transcribe, startoflm, startofprev, nospeech,
    notimestamps, timestamps…). The reference's hardcoded English table
    (whisper.h:34-42) gets translate/transcribe one too high and swaps
    solm/nospeech — latent there because its English path never samples
    them; its "+1 shift" multilingual transform (whisper.cpp:218-226)
    propagates the same error, which is why its decoder prompt hardcodes
    the correct 50359 instead of using the shifted table value."""

    def test_english_ids(self):
        st = special_tokens_for(multilingual=False)
        assert (st.eot, st.sot) == (50256, 50257)
        assert (st.translate, st.transcribe) == (50357, 50358)
        assert (st.solm, st.prev, st.nospeech) == (50359, 50360, 50361)
        assert (st.not_, st.beg) == (50362, 50363)

    def test_multilingual_ids(self):
        st = special_tokens_for(multilingual=True)
        assert (st.eot, st.sot) == (50257, 50258)
        assert (st.translate, st.transcribe) == (50358, 50359)
        assert (st.solm, st.prev, st.nospeech) == (50360, 50361, 50362)
        assert st.not_ == 50363 and st.beg == 50364

    def test_large_v3_ids(self):
        # <|yue|> pushes everything after the language block up by one.
        st = special_tokens_for(multilingual=True, num_languages=100)
        assert (st.translate, st.transcribe) == (50359, 50360)
        assert st.not_ == 50364 and st.beg == 50365
        assert st.lang_token(99) == 50358  # <|yue|> itself

    def test_yue_rejected_on_99_language_models(self):
        st = special_tokens_for(multilingual=True)
        with pytest.raises(ValueError, match="yue"):
            st.lang_token(99)

    def test_reference_prompt_sequence(self):
        # Expected multilingual German prompt [50258, 50261, 50359, 50363]
        # per whisper.cpp:331-332 — with the corrected table this IS the
        # default prompt (sot, lang, transcribe, notimestamps): the
        # reference's hardcoded IDs were checkpoint-correct even though its
        # own token table wasn't.
        st = special_tokens_for(multilingual=True)
        assert st.sot == 50258
        assert st.lang_token(language_id("de")) == 50261
        assert st.transcribe == 50359 and st.not_ == 50363


class TestVocabSynthesis:
    def test_synthesized_specials_english(self):
        v = Vocab.synthetic(multilingual=False)
        st = v.specials
        assert v.surface(st.eot) == b"<|endoftranscript|>"
        assert v.surface(st.sot) == b"<|startoftranscript_|>"
        assert v.surface(st.transcribe) == b"<|transcribe|>"
        assert v.surface(st.not_) == b"<|notimestamps|>"
        assert v.surface(st.beg) == b"<|timestampbegin|>"
        assert v.surface(st.beg + 5) == b"<|TT5|>"

    def test_language_surfaces_multilingual(self):
        v = Vocab.synthetic(multilingual=True)
        st = v.specials
        assert v.surface(st.sot + 1) == b"<|lang-en|>"
        assert v.surface(st.sot + 1 + language_id("de")) == b"<|lang-de|>"

    def test_is_special_threshold(self):
        v = Vocab.synthetic(multilingual=False)
        assert not v.is_special(v.specials.eot - 1)
        assert v.is_special(v.specials.eot)  # whisper.cpp:648 uses id < eot


class TestDetokenize:
    def test_concat_and_eot_stop(self):
        v = Vocab.synthetic()
        ids = [ord("h"), ord("i"), v.specials.eot, ord("x")]
        # EOT surface appended, then stop (whisper.cpp:645-656).
        assert decode_tokens(v, ids) == "hi<|endoftranscript|>"
        assert decode_tokens(v, ids, omit_special_tokens=True) == "hi"

    def test_remove_extra_spaces(self):
        assert remove_extra_spaces("a  b   c") == "a b c"
        assert remove_extra_spaces("  x ") == " x "
        assert remove_extra_spaces("") == ""


class TestBinFormat:
    def _filters(self):
        rng = np.random.default_rng(1)
        return rng.standard_normal((80, 201)).astype(np.float32)

    def _table(self):
        return {i: bytes([65 + (i % 26)]) * (1 + i % 3) for i in range(64)}

    @pytest.mark.parametrize("size_prefix", [True, False])
    def test_roundtrip(self, tmp_path, size_prefix):
        p = str(tmp_path / "assets.bin")
        filters = self._filters()
        table = self._table()
        write_bin(p, filters, table, size_prefix=size_prefix)
        assets = read_bin(p, multilingual=False)
        assert assets.had_size_prefix == size_prefix
        np.testing.assert_array_equal(assets.mel_filters, filters)
        for i, tok in table.items():
            assert assets.vocab.surface(i) == tok
        # Specials synthesized past file vocab (whisper.cpp:578-604).
        assert assets.vocab.surface(50256) == b"<|endoftranscript|>"

    def test_multilingual_read(self, tmp_path):
        p = str(tmp_path / "assets_ml.bin")
        write_bin(p, self._filters(), self._table())
        assets = read_bin(p, multilingual=True)
        assert assets.vocab.specials.eot == 50257
        assert assets.vocab.surface(50259) == b"<|lang-en|>"
