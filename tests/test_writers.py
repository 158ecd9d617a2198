"""Output writers (utils/writers.py): srt/vtt/tsv/txt/json format contracts.

Pure host-side tests over synthetic results — no model involved. Format
strings are pinned against the de-facto openai-whisper writer conventions so
exported files drop into existing subtitle toolchains.
"""

import io
import json
import os

import numpy as np
import pytest

from whisper_tpu.decode.align import Word
from whisper_tpu.decode.segments import Segment
from whisper_tpu.engine.engine import (
    LongTranscriptionResult,
    TranscriptionResult,
)
from whisper_tpu.utils.writers import (
    OUTPUT_FORMATS,
    format_timestamp,
    iter_segments,
    write_json,
    write_result,
    write_srt,
    write_tsv,
    write_txt,
    write_vtt,
)


def _result(segments=None, words=None, text=" hello world", **kw):
    return TranscriptionResult(
        text=text,
        tokens=np.zeros(4, np.int32),
        length=4,
        language="en",
        segments=segments,
        words=words,
        **kw,
    )


SEGS = [
    Segment(start=0.0, end=2.5, text=" First bit.", tokens=(1, 2)),
    Segment(start=2.5, end=7.02, text=" Second bit.", tokens=(3,)),
]


class TestFormatTimestamp:
    def test_basic(self):
        assert format_timestamp(0.0) == "00:00.000"
        assert format_timestamp(2.5) == "00:02.500"
        assert format_timestamp(61.0) == "01:01.000"

    def test_hours(self):
        assert format_timestamp(3661.5) == "01:01:01.500"
        assert format_timestamp(59.0, always_include_hours=True) == "00:00:59.000"

    def test_comma_marker_and_rounding(self):
        assert format_timestamp(1.9996, decimal_marker=",") == "00:02,000"
        assert format_timestamp(0.0004) == "00:00.000"

    def test_negative_clamps(self):
        assert format_timestamp(-3.0) == "00:00.000"


class TestSegmentIteration:
    def test_timestamped(self):
        segs = list(iter_segments(_result(segments=SEGS)))
        assert [s["text"] for s in segs] == [" First bit.", " Second bit."]
        assert segs[0]["start"] == 0.0 and segs[1]["end"] == 7.02

    def test_no_timestamps_single_cue(self):
        (seg,) = iter_segments(_result())
        assert seg["text"] == "hello world"
        assert seg["start"] == 0.0 and seg["end"] == 30.0

    def test_words_bound_untimestamped_end(self):
        words = [Word("hello", 0.3, 0.8, [1]), Word(" world", 0.9, 1.4, [2])]
        (seg,) = iter_segments(_result(words=words))
        assert seg["end"] == 1.4
        assert [w["word"] for w in seg["words"]] == ["hello", " world"]

    def test_silent_result_yields_nothing(self):
        assert list(iter_segments(_result(is_silent=True))) == []

    def test_long_result_applies_offsets(self):
        long = LongTranscriptionResult(
            text="a b",
            offsets=[0.0, 60.0],
            chunks=[_result(segments=SEGS[:1]), _result(segments=SEGS[:1])],
        )
        segs = list(iter_segments(long))
        assert segs[0]["start"] == 0.0
        assert segs[1]["start"] == 60.0 and segs[1]["end"] == 62.5

    def test_words_attach_to_covering_segment(self):
        words = [Word("First", 0.2, 1.0, [1]), Word(" Second", 3.0, 4.0, [3])]
        segs = list(iter_segments(_result(segments=SEGS, words=words)))
        assert [w["word"] for w in segs[0]["words"]] == ["First"]
        assert [w["word"] for w in segs[1]["words"]] == [" Second"]

    def test_no_word_is_ever_dropped(self):
        # Words at the final segment's exact end, inside an inter-segment
        # gap, and before the first segment all attach to the nearest
        # segment instead of vanishing (ADVICE r2 #4).
        gap_segs = [
            Segment(start=1.0, end=2.0, text=" a", tokens=(1,)),
            Segment(start=5.0, end=7.0, text=" b", tokens=(2,)),
        ]
        words = [
            Word("early", 0.1, 0.5, [9]),  # before the first segment
            Word(" gap", 3.0, 3.5, [9]),  # between segments
            Word(" end", 7.0, 7.4, [9]),  # exactly at the last end
        ]
        segs = list(iter_segments(_result(segments=gap_segs, words=words)))
        attached = [w["word"] for s in segs for w in s.get("words", [])]
        assert attached == ["early", " gap", " end"]
        assert [w["word"] for w in segs[0]["words"]] == ["early", " gap"]
        assert [w["word"] for w in segs[1]["words"]] == [" end"]


class TestWriters:
    def test_srt(self):
        buf = io.StringIO()
        write_srt(_result(segments=SEGS), buf)
        assert buf.getvalue() == (
            "1\n00:00:00,000 --> 00:00:02,500\nFirst bit.\n\n"
            "2\n00:00:02,500 --> 00:00:07,020\nSecond bit.\n\n"
        )

    def test_vtt(self):
        buf = io.StringIO()
        write_vtt(_result(segments=SEGS), buf)
        out = buf.getvalue()
        assert out.startswith("WEBVTT\n\n")
        assert "00:00.000 --> 00:02.500\nFirst bit.\n" in out

    def test_tsv_milliseconds(self):
        buf = io.StringIO()
        write_tsv(_result(segments=SEGS), buf)
        lines = buf.getvalue().splitlines()
        assert lines[0] == "start\tend\ttext"
        assert lines[1] == "0\t2500\tFirst bit."
        assert lines[2] == "2500\t7020\tSecond bit."

    def test_txt(self):
        buf = io.StringIO()
        write_txt(_result(segments=SEGS), buf)
        assert buf.getvalue() == "First bit.\nSecond bit.\n"

    def test_txt_silent_still_emits_line(self):
        buf = io.StringIO()
        write_txt(_result(is_silent=True, text=""), buf)
        assert buf.getvalue() == "\n"

    def test_json(self):
        buf = io.StringIO()
        write_json(
            _result(segments=SEGS, temperature=0.2, avg_logprob=-0.5), buf
        )
        out = json.loads(buf.getvalue())
        assert out["text"] == "hello world"
        assert out["language"] == "en"
        assert len(out["segments"]) == 2
        assert out["temperature"] == 0.2 and out["avg_logprob"] == -0.5

    def test_json_long(self):
        long = LongTranscriptionResult(
            text="joined text",
            offsets=[0.0],
            chunks=[_result(segments=SEGS)],
        )
        buf = io.StringIO()
        write_json(long, buf)
        out = json.loads(buf.getvalue())
        assert out["text"] == "joined text"
        assert out["language"] == "en"


class TestWriteResult:
    def test_single_format(self, tmp_path):
        paths = write_result(
            _result(segments=SEGS), "/audio/jfk.wav", "srt", str(tmp_path)
        )
        assert paths == [str(tmp_path / "jfk.srt")]
        assert os.path.exists(paths[0])

    def test_all_formats(self, tmp_path):
        paths = write_result(
            _result(segments=SEGS), "x.wav", "all", str(tmp_path)
        )
        exts = {os.path.splitext(p)[1] for p in paths}
        assert exts == {".txt", ".srt", ".vtt", ".tsv", ".json"}

    def test_unknown_format_raises(self, tmp_path):
        with pytest.raises(ValueError):
            write_result(_result(), "x.wav", "ass", str(tmp_path))

    def test_formats_constant(self):
        assert "all" in OUTPUT_FORMATS and "srt" in OUTPUT_FORMATS


class TestCLIOutputFormat:
    def test_transcribe_writes_outputs(self, tmp_path):
        from whisper_tpu.audio.wav import write_wav
        from whisper_tpu.cli import main

        wav = str(tmp_path / "utt.wav")
        write_wav(wav, np.zeros(8000, np.float32))
        out_dir = str(tmp_path / "out")
        rc = main([
            "transcribe", wav, "--model", "dev.en", "--dtype", "float32",
            "--max-new-tokens", "2", "--output-format", "all",
            "--output-dir", out_dir,
        ])
        assert rc == 0
        names = sorted(os.listdir(out_dir))
        assert names == ["utt.json", "utt.srt", "utt.tsv", "utt.txt",
                         "utt.vtt"]
        with open(os.path.join(out_dir, "utt.json")) as fh:
            assert "segments" in json.load(fh)

    def test_transcribe_long_flag(self, tmp_path, capsys):
        from whisper_tpu.audio.wav import write_wav
        from whisper_tpu.cli import main

        wav = str(tmp_path / "long.wav")
        write_wav(wav, np.zeros(16000, np.float32))
        rc = main([
            "transcribe", wav, "--model", "dev.en", "--dtype", "float32",
            "--max-new-tokens", "2", "--long",
        ])
        assert rc == 0
