#!/usr/bin/env bash
# Full (nightly) test suite: every test including slow-marked sampler
# pipeline / parity / multi-process tests, with a committed log for the
# round record (VERDICT r2 item 5).
#
#   bash scripts/run_full_suite.sh [extra pytest args]
#
# Writes docs/test_logs/full_suite_$(date +%Y%m%d).log
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/test_logs
LOG="docs/test_logs/full_suite_$(date +%Y%m%d).log"
{
  echo "== full suite: $(date -u +%Y-%m-%dT%H:%M:%SZ) =="
  echo "== git: $(git rev-parse --short HEAD) =="
  python -m pytest tests/ -q -m "" --durations=20 "$@" 2>&1
  echo "== exit: $? =="
} | tee "$LOG"
