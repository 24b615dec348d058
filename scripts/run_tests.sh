#!/bin/sh
# Test-suite runner for small hosts (VERDICT r1 item 7).
#
#   scripts/run_tests.sh smoke   fast subset (`-m "not slow"`), target <2 min
#                                on a many-core host / <10 min on 1 core
#   scripts/run_tests.sh full    everything, chunked so no single pytest
#                                invocation runs longer than a CI timeout
#
# The heavy files are marked `slow` (pytest.ini) — full-size model
# assemblies, trainer e2e loops, and the torch-reference parity harness.
set -e
cd "$(dirname "$0")/.."

mode="${1:-smoke}"

if [ "$mode" = "smoke" ]; then
    exec python -m pytest tests/ -q -m "not slow"
fi

# full, chunked: fast subset first, then each slow file alone
python -m pytest tests/ -q -m "not slow"
for f in $(grep -l "pytestmark = pytest.mark.slow" tests/test_*.py); do
    python -m pytest "$f" -q
done
