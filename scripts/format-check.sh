#!/usr/bin/env bash
# Format/lint gate (reference scripts/format-check.sh:6-58 analogue).
# Runs every tool that is installed; configs live in pyproject.toml /
# .clang-format. In the hermetic build image none of these are installed —
# run on a dev machine or via pre-commit.
set -u
cd "$(dirname "$0")/.."
status=0
run() {
  if command -v "$1" >/dev/null 2>&1; then
    echo "== $*"
    "$@" || status=1
  else
    echo "-- $1 not installed, skipped"
  fi
}
run black --check whisper_tpu tests tools bench.py __graft_entry__.py
run isort --check-only whisper_tpu tests tools bench.py __graft_entry__.py
run ruff check whisper_tpu tests tools
if command -v clang-format >/dev/null 2>&1; then
  echo "== clang-format --dry-run native/*.cpp"
  clang-format --dry-run --Werror native/*.cpp || status=1
else
  echo "-- clang-format not installed, skipped"
fi
run shfmt -d scripts
exit $status
