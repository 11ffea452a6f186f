#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# Broadcast-FM stereo from a real RTL-SDR running `rtl_tcp -a 0.0.0.0`
# anywhere on the network. Usage: live_rtl_tcp.sh HOST[:PORT] [MHz]
HOST=${1:-127.0.0.1:1234}
FREQ=${2:-89.5}
exec python -m pysdr_tpu --rtl-tcp "$HOST" --fc "$FREQ" --mode WFM2 \
    --fs 1.92 --fs-out 192 --rf-gain 28 --realtime --wav fm \
    --web 8080
