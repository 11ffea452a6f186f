#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# Rig-follow monitoring (the reference's FOLLOW / FT8follow launchers):
# the SDR hangs off the station rig's RX-out ("-ant B -follow") and
# tracks the rig's dial as the operator moves across adjacent bands —
# FRQS="7074 10136 14074", FS=8 in the reference. Here --rig points at
# a running rigctld (rigctld -m 1 for the dummy rig to try it out); the
# follower loop polls the dial and retunes the matching RX, while
# out-of-band dials trigger a device-follow recentre of the whole
# passband. Three FT8 slots inside one 8 MHz window, ready for one
# WSJT-X per --hamlib port.
exec python -m pysdr_tpu \
    --ft8 40m 30m 20m \
    --fs 8.0 --video-bw 45 --af-bw 5 \
    --ant B --rig 127.0.0.1:4532 \
    --realtime --hamlib \
    --web 8080 "$@"
