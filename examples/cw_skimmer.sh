#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# CW contest skimming (the reference's start_cw2/start_cw3 launchers):
# two CW RXs on the 20m contest segments with narrow 500 Hz audio
# filters and fast AGC, each exposed as a hamlib rig (pyKeyer/fldigi
# connect to ports 4575/4576), UDP bandmap spots on 4675 feed the
# RF display, and the web viewer gives click-to-tune skimming.
exec python -m pysdr_tpu \
    --fc 14.010 14.060 --mode CW --fs 0.512 \
    --af-bw 0.5 --bfo 700 --stereo \
    --realtime --hamlib --udp-port 4675 \
    --web 8080 "$@"
