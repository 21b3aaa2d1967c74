#!/usr/bin/env bash
# Three-lane test runner (single-CPU container; xdist doesn't help at nproc=1).
# Wall-times measured round 3 (late) on this box (1 core, warm XLA cache):
#   tools/run_tests.sh quick   — excludes @slow/@parity   (~6 min warm,
#                                ~151 tests; count drifts as tests land —
#                                trust pytest's summary, not this header)
#   tools/run_tests.sh full    — everything except @parity (~20 min warm,
#                                ~200 tests; Base-dim parity, 2-process
#                                distributed, real-file integration runs)
#   tools/run_tests.sh parity  — opt-in heaviest lane: Large-dim steps on the
#                                virtual CPU mesh (tens of minutes per test)
# Plain `pytest tests/` equals the full lane (pytest.ini addopts excludes
# @parity; an explicit -m on the CLI overrides it).
set -euo pipefail
cd "$(dirname "$0")/.."
lane="${1:-quick}"
case "$lane" in
  quick)  exec python -m pytest tests/ -q -m "not slow and not parity" ;;
  full)   exec python -m pytest tests/ -q ;;
  parity) exec python -m pytest tests/ -q -m parity ;;
  *) echo "usage: $0 [quick|full|parity]" >&2; exit 2 ;;
esac
