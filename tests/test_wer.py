"""WER evaluation tests (utils/wer.py + `whisper-tpu eval`)."""

import json

import pytest

from whisper_tpu.utils.wer import edit_distance, normalize_text, word_error_rate


class TestNormalize:
    def test_case_punct_whitespace(self):
        assert normalize_text("  Mr. Quilter,  IS  the\tapostle! ") == (
            "mr quilter is the apostle"
        )

    def test_keeps_apostrophes(self):
        assert normalize_text("don't stop") == "don't stop"


class TestEditDistance:
    def test_exact(self):
        s, d, i, h = edit_distance("a b c".split(), "a b c".split())
        assert (s, d, i, h) == (0, 0, 0, 3)

    def test_substitution(self):
        s, d, i, h = edit_distance("a b c".split(), "a x c".split())
        assert (s, d, i, h) == (1, 0, 0, 2)

    def test_deletion_insertion(self):
        s, d, i, _ = edit_distance("a b c".split(), "a c".split())
        assert (s, d, i) == (0, 1, 0)
        s, d, i, _ = edit_distance("a c".split(), "a b c".split())
        assert (s, d, i) == (0, 0, 1)

    def test_empty_sides(self):
        assert edit_distance([], "a b".split())[2] == 2  # insertions
        assert edit_distance("a b".split(), [])[1] == 2  # deletions


class TestCorpusWer:
    def test_perfect(self):
        r = word_error_rate(["hello world"], ["Hello, world!"])
        assert r.wer == 0.0 and r.hits == 2

    def test_known_rate(self):
        # 1 sub + 1 del over 4 ref words → 0.5
        r = word_error_rate(["the cat sat down"], ["the dog sat"])
        assert r.wer == pytest.approx(0.5)
        assert r.substitutions == 1 and r.deletions == 1

    def test_corpus_pools_words(self):
        r = word_error_rate(["a b", "c d e"], ["a b", "c x e"])
        assert r.ref_words == 5 and r.wer == pytest.approx(0.2)

    def test_mismatched_lengths_raise(self):
        with pytest.raises(ValueError):
            word_error_rate(["a"], ["a", "b"])


class TestEvalCli:
    def test_eval_command(self, tmp_path, capsys):
        from whisper_tpu.cli import main

        refs = tmp_path / "refs.txt"
        hyps = tmp_path / "hyps.txt"
        refs.write_text("the cat sat down\nhello world\n")
        hyps.write_text("the dog sat\nhello world\n")
        assert main(["eval", "--refs", str(refs), "--hyps", str(hyps)]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["ref_words"] == 6
        assert out["wer"] == pytest.approx(2 / 6)
