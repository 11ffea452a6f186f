#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# Decode the committed 45.45-baud RTTY capture; text prints live
# (expected: RYRY CQ CQ DE AA2IL AA2IL K).
FIX="$REPO/tests/fixtures"
exec python -m pysdr_tpu --replay "$FIX/rtty_cq.dat" --no-loop \
    --fc 100.0 --mode RTTY --block 4096 --rtty 0 "$@"
