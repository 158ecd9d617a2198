"""BPE text encoder (tokenizer/bpe.py).

The reference never encodes text (its prompts are hardcoded IDs —
whisper.cpp:327-339); openai-whisper's ``initial_prompt`` surface does, via
tiktoken. These tests pin the rank-ordered byte-pair merge against
hand-computed expectations on a constructed vocab, the encode∘decode
round-trip over arbitrary unicode, and openai's leading-space +
crop-to-last-(n_ctx//2-1) prompt semantics.
"""

import pytest

from whisper_tpu.tokenizer.bpe import encode_initial_prompt, encode_text
from whisper_tpu.tokenizer.detokenize import decode_tokens
from whisper_tpu.tokenizer.vocab import Vocab


def merged_vocab():
    """256 byte tokens (ids 0-255) + merges minted in rank order, the
    tiktoken id==rank convention the encoder relies on."""
    table = {i: bytes([i]) for i in range(256)}
    merges = [b"th", b"he", b"the", b" t", b" the", b"er", b"ll", b"llo"]
    for j, m in enumerate(merges):
        table[256 + j] = m
    return Vocab(table, multilingual=False, n_vocab=256 + len(merges))


class TestBytePairMerge:
    def test_hand_computed_merge_order(self):
        v = merged_vocab()
        # "the": th(256) beats he(257); then the(258) covers the piece.
        assert encode_text(v, "the") == [258]
        # " the": th merges first, then "the", then " the"(260).
        assert encode_text(v, " the") == [260]
        # Both pieces through the pre-tokenizer: "the" + " the".
        assert encode_text(v, "the the") == [258, 260]

    def test_leftmost_tie_break(self):
        # "thth": pairs th|th share rank 256; leftmost merges first, then
        # the second — never the middle "ht".
        v = merged_vocab()
        assert encode_text(v, "thth") == [256, 256]

    def test_unmerged_bytes_fall_through(self):
        v = merged_vocab()
        # "her": he(257) merges, then "her" absent → he + r.
        assert encode_text(v, "her") == [257, ord("r")]

    def test_whole_piece_shortcut(self):
        v = merged_vocab()
        assert encode_text(v, "llo") == [263]

    def test_special_surfaces_never_match(self):
        # "<|transcribe|>" as TEXT must encode to byte tokens, not the
        # special id — the pre-tokenizer splits the punctuation.
        v = Vocab.synthetic(multilingual=False)
        ids = encode_text(v, "<|transcribe|>")
        assert all(i < 256 for i in ids)
        assert decode_tokens(v, ids) == "<|transcribe|>"


class TestRoundTrip:
    @pytest.mark.parametrize(
        "text",
        [
            "Mr. Quilter is the apostle of the middle classes.",
            "  leading and   inner spaces kept ",
            "tabs\tand\nnewlines",
            "números, straße, 東京タワー, עברית",
            "emoji 🎤🔊 and digits 12345",
            "contractions: don't we'll I'm they've",
            "",
        ],
    )
    def test_encode_decode_identity(self, text):
        v = merged_vocab()
        ids = encode_text(v, text)
        assert decode_tokens(v, ids) == text

    def test_all_ids_below_eot(self):
        v = merged_vocab()
        ids = encode_text(v, "the quick brown fox <|weird|> \x00\xff")
        assert all(0 <= i < v.specials.eot for i in ids)


class TestInitialPromptSemantics:
    def test_leading_space_forced(self):
        # openai: tokenizer.encode(" " + initial_prompt.strip())
        v = merged_vocab()
        assert encode_initial_prompt(v, "the") == encode_text(v, " the")
        assert encode_initial_prompt(v, "   the  ") == encode_text(v, " the")

    def test_text_prompt_through_engine_config(self):
        """EngineConfig(initial_prompt=<text>) lands the encoded tokens after
        <|startofprev|>, cropped to the last n_text_ctx//2 - 1 — openai
        ``_get_initial_tokens``."""
        from whisper_tpu.config import EngineConfig
        from whisper_tpu.decode.prompt import build_prompt
        from whisper_tpu.engine import EngineType, create_engine

        config = EngineConfig(
            model="dev.en", dtype="float32", initial_prompt="the the",
            max_new_tokens=4,
        )
        engine = create_engine(EngineType.MONOLITH, config, seed=0)
        v = engine.vocab
        want = build_prompt(
            multilingual=False,
            language="en",
            task="transcribe",
            timestamps=False,
            specials=v.specials,
            prefix_tokens=encode_text(v, " the the"),
            n_text_ctx=engine.dims.n_text_ctx,
        )
        assert engine._prompt.tolist() == [int(t) for t in want]
        assert int(engine._prompt[0]) == v.specials.prev

    def test_crop_keeps_last_half_ctx(self):
        from whisper_tpu.decode.prompt import build_prompt
        from whisper_tpu.tokenizer.vocab import Vocab as V

        v = V.synthetic(multilingual=False)
        n_ctx = 40
        keep = n_ctx // 2 - 1
        prefix = list(range(100, 100 + keep + 10))
        prompt = build_prompt(
            multilingual=False,
            language="en",
            task="transcribe",
            timestamps=False,
            specials=v.specials,
            prefix_tokens=prefix,
            n_text_ctx=n_ctx,
        )
        kept = prompt[1 : 1 + keep]
        assert kept == prefix[-keep:]

    def test_text_and_ids_mutually_exclusive(self):
        from whisper_tpu.config import EngineConfig
        from whisper_tpu.engine import EngineType, create_engine

        config = EngineConfig(
            model="dev.en", dtype="float32", initial_prompt="hi",
            initial_prompt_tokens=(1, 2),
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            create_engine(EngineType.MONOLITH, config, seed=0)
