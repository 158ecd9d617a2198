from whisper_tpu.tokenizer.vocab import Vocab, SpecialTokens
from whisper_tpu.tokenizer.languages import LANGUAGES, language_id, lang_code
from whisper_tpu.tokenizer.detokenize import decode_tokens, remove_extra_spaces
from whisper_tpu.tokenizer.bpe import encode_text, encode_initial_prompt

__all__ = [
    "Vocab",
    "SpecialTokens",
    "LANGUAGES",
    "language_id",
    "lang_code",
    "decode_tokens",
    "remove_extra_spaces",
    "encode_text",
    "encode_initial_prompt",
]
