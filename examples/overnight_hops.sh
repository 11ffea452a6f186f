#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# Overnight band-hopping monitor (the reference FreqHopper driven from
# the presets 'Hops' sheet, hopper.py:74-111): RX0 hops through the
# hour-keyed schedule in overnight.hops, aligned to the WSJT 15 s
# cycle, with the watchdog latency log captured for the morning's
# python -m pysdr_tpu.latency analysis.
exec python -m pysdr_tpu \
    --fc 7.074 --mode USB --fs 0.512 --af-bw 5 \
    --realtime --hop-schedule "$REPO/examples/overnight.hops" \
    --dwell 150 --watchdog-log /tmp/pysdr_overnight.csv \
    --web 8080 "$@"
