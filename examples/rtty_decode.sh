#!/bin/sh
# Decode the committed 45.45-baud RTTY capture; text prints live
# (expected: RYRY CQ CQ DE AA2IL AA2IL K).
cd "$(dirname "$0")/.."
exec python -m pysdr_tpu --replay tests/fixtures/rtty_cq.dat --no-loop \
    --fc 100.0 --mode RTTY --block 4096 --rtty 0 "$@"
