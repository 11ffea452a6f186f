#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# Dual-repeater monitoring (the reference's TEST script): two NFM RXs
# 25 kHz apart, squelched, routed to one stereo pair (RX0=L, RX1=R),
# live viewer on :8080. Synth stations stand in for the repeaters.
exec python -m pysdr_tpu \
    --fc 146.940 146.965 --mode NFM --squelch 6 \
    --fs 0.512 --video-bw 16 --stereo --realtime \
    --wav repeaters --web 8080 "$@"
