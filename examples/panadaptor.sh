#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# CW/RTTY pan adaptor (the reference's PANADAPTOR / startup launchers):
# a single narrow CW receiver whose AF-PSD pane is the pan display
# ("-pan -pan_bw 10 -pan_dr 90" in the reference), with the UDP bandmap
# server accepting spot datagrams that paint onto the waterfall and
# fldigi instances kept in sync over XML-RPC ("click on FOLLOW FLDIGI
# freq" in the reference's notes). 90 dB dynamic-range clamp, 500 Hz
# audio filter, audio muted at the sink — the pan display is the
# product here, not the speaker.
exec python -m pysdr_tpu \
    --fc 7.030 --mode CW --fs 0.96 --fs-out 48 \
    --af-bw 0.5 --video-bw 10 --mute \
    --psd --bb --pan-dr 90 \
    --udp-port 12345 --fldigi-ports 7362 \
    --realtime --web 8080 "$@"
