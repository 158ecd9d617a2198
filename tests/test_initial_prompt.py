"""Initial-prompt conditioning (decode/prompt.py prefix_tokens + engine
wiring): prompt construction, cropping, SOT-relative language handling,
transcript hygiene (no prefix leakage), and decode-path determinism."""

import numpy as np
import pytest

from whisper_tpu.config import EngineConfig
from whisper_tpu.decode.prompt import build_prompt
from whisper_tpu.engine import EngineType, create_engine
from whisper_tpu.tokenizer.vocab import special_tokens_for


class TestBuildPrompt:
    def test_prefix_prepended_with_startofprev(self):
        st = special_tokens_for(True)
        base = build_prompt(True, "en", specials=st)
        got = build_prompt(True, "en", specials=st, prefix_tokens=[5, 6, 7])
        assert got == [st.prev, 5, 6, 7] + base

    def test_prefix_cropped_to_half_ctx(self):
        st = special_tokens_for(True)
        prefix = list(range(1000, 1600))
        got = build_prompt(
            True, "en", specials=st, prefix_tokens=prefix, n_text_ctx=448
        )
        keep = 448 // 2 - 1  # 223, openai's window
        assert got[0] == st.prev
        assert got[1 : 1 + keep] == prefix[-keep:]

    def test_english_only_model_prefix(self):
        st = special_tokens_for(False)
        got = build_prompt(False, specials=st, prefix_tokens=[9, 8])
        assert got == [st.prev, 9, 8, st.sot, st.not_]

    def test_no_prefix_unchanged(self):
        st = special_tokens_for(True)
        assert build_prompt(True, "de", specials=st) == build_prompt(
            True, "de", specials=st, prefix_tokens=None
        )


class TestEngine:
    @pytest.fixture(scope="class")
    def audio(self):
        rng = np.random.default_rng(11)
        return (0.1 * rng.standard_normal(16_000)).astype(np.float32)

    def _cfg(self, **kw):
        base = dict(
            model="dev", language="en", max_new_tokens=4, dtype="float32"
        )
        base.update(kw)
        return EngineConfig(**base)

    def test_prefix_in_prompt_and_clean_transcript(self, audio):
        # Prefix uses ordinary text tokens — they must NOT leak into text.
        eng = create_engine(
            EngineType.MONOLITH,
            self._cfg(initial_prompt_tokens=(10, 11, 12)),
            seed=0,
        )
        st = eng.vocab.specials
        assert list(eng._prompt[:4]) == [st.prev, 10, 11, 12]
        assert eng._sot_index == 4
        res = eng.transcribe(audio)
        plain_surfaces = [
            eng.vocab.surface(t).decode("utf-8", "replace")
            for t in (10, 11, 12)
        ]
        for s in plain_surfaces:
            assert s not in res.text or not s.strip()
        # full row still contains the prefix (tokens field is raw)
        assert list(res.tokens[:4]) == [st.prev, 10, 11, 12]

    def test_conditioning_changes_decode(self, audio):
        base = create_engine(EngineType.MONOLITH, self._cfg(), seed=0)
        cond = create_engine(
            EngineType.MONOLITH,
            self._cfg(initial_prompt_tokens=(10, 11, 12)),
            seed=0,
        )
        r0 = base.transcribe(audio)
        r1 = cond.transcribe(audio)
        gen0 = list(r0.tokens[len(base._prompt) : r0.length])
        gen1 = list(r1.tokens[len(cond._prompt) : r1.length])
        # determinism per engine
        assert gen1 == list(
            cond.transcribe(audio).tokens[len(cond._prompt) :][
                : len(gen1)
            ]
        )
        assert len(gen0) > 0 and len(gen1) > 0

    def test_language_slot_detection_with_prefix(self, audio):
        # language=None on the multilingual dev model → autodetect writes
        # the slot at sot_index+1, not 1.
        eng = create_engine(
            EngineType.MONOLITH,
            self._cfg(language=None, initial_prompt_tokens=(10, 11)),
            seed=0,
        )
        res = eng.transcribe(audio)
        st = eng.vocab.specials
        lang_tok = int(res.tokens[eng._sot_index + 1])
        assert st.sot + 1 <= lang_tok <= st.sot + 100
        assert res.language  # decoded back out of the right slot

    def test_budget_respects_longer_prompt(self, audio):
        eng = create_engine(
            EngineType.MONOLITH,
            self._cfg(initial_prompt_tokens=tuple(range(10, 40)),
                      max_new_tokens=None),
            seed=0,
        )
        assert len(eng._prompt) + eng._max_new <= eng.dims.n_text_ctx
