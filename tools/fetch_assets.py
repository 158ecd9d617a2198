"""One-time asset fetch for the golden-contract test (NETWORK REQUIRED).

This build environment has zero egress, so tests/test_golden.py ships gated
on env vars instead of running in CI. On any machine with network access:

    python tools/fetch_assets.py --out-dir ~/.cache/whisper_tpu_assets
    # then (printed at the end):
    WHISPER_TPU_CKPT=... WHISPER_TPU_GOLDEN_WAV=... \
        python -m pytest tests/test_golden.py -v

Downloads:
* openai/whisper-tiny.en (HF snapshot — the monolith golden model,
  reference scripts/run.sh:8-11 uses its exported .tflite)
* the LibriSpeech dummy clip (hf-internal-testing/librispeech_asr_dummy,
  validation[0]: "Mr. Quilter is the apostle of the middle classes…" —
  the exact sample behind the reference's golden IDs, whisper.h:27-32)
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out-dir", default=os.path.expanduser("~/.cache/whisper_tpu_assets")
    )
    ap.add_argument(
        "--model", default="openai/whisper-tiny.en",
        help="HF checkpoint id (tiny.en is the golden-contract model)",
    )
    ap.add_argument("--run-test", action="store_true",
                    help="run tests/test_golden.py after fetching")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print("huggingface_hub not installed — pip install huggingface_hub",
              file=sys.stderr)
        return 2

    ckpt_dir = snapshot_download(
        args.model,
        allow_patterns=["*.json", "*.safetensors", "*.bin", "*.txt",
                        "tokenizer*", "vocab*", "merges*"],
    )
    print(f"checkpoint: {ckpt_dir}")

    wav_path = os.path.join(args.out_dir, "librispeech_dummy_0.wav")
    if not os.path.exists(wav_path):
        import numpy as np

        from datasets import load_dataset

        ds = load_dataset(
            "hf-internal-testing/librispeech_asr_dummy", "clean",
            split="validation",
        )
        sample = ds[0]["audio"]
        assert sample["sampling_rate"] == 16_000, sample["sampling_rate"]
        x = np.asarray(sample["array"], dtype=np.float32)

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from whisper_tpu.audio.wav import write_wav

        write_wav(wav_path, x)
    print(f"golden wav: {wav_path}")

    env = {"WHISPER_TPU_CKPT": ckpt_dir, "WHISPER_TPU_GOLDEN_WAV": wav_path}
    print("\nrun the golden contract test with:")
    print("  " + " ".join(f"{k}={v}" for k, v in env.items())
          + " python -m pytest tests/test_golden.py -v")

    if args.run_test:
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        return subprocess.call(
            [sys.executable, "-m", "pytest", "tests/test_golden.py", "-v"],
            cwd=repo, env={**os.environ, **env},
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
