#!/usr/bin/env bash
# Two-lane test runner (single-CPU container; xdist doesn't help at nproc=1).
#   tools/run_tests.sh quick   — default lane, excludes @slow (~2 min)
#   tools/run_tests.sh full    — everything incl. Base-dim parity + long
#                                integration runs (~20 min)
set -euo pipefail
cd "$(dirname "$0")/.."
lane="${1:-quick}"
case "$lane" in
  quick) exec python -m pytest tests/ -q -m "not slow" ;;
  full)  exec python -m pytest tests/ -q ;;
  *) echo "usage: $0 [quick|full]" >&2; exit 2 ;;
esac
