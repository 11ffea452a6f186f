#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# The flagship configuration (BASELINE config 5): a 12.288 MHz passband
# split into 64 uniform 192 kHz channels by the polyphase channelizer,
# every channel demodulated (per-channel mode/BW/squelch live-tunable
# from the web viewer), audio returned on the compact mu-law i8 wire,
# RF shipped as CS8. This is the configuration the reference cannot
# reach at all — its per-RX Python chains cap at 6 receivers
# (reference params.py:33); the channelizer generalizes them to 64+ in
# one branch-filter pass + one DFT matmul. Runs on the synthetic
# passband as shipped; swap in `--replay capture.dat` or
# `--rtl-tcp host:1234` for recorded/live RF. Open http://localhost:8080.
exec python -m pysdr_tpu \
    --fs 12.288 --fc 100.0 \
    --channelize 64 --block 12288 \
    --wire i8 --audio-wire i8 \
    --squelch 10 --realtime --web 8080 "$@"
