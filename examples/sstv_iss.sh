#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# SSTV from the ISS (the reference's SSTV launcher): 145.800 MHz NFM
# with a wide 25 kHz channel filter (SSTV subcarriers + Doppler), AGC
# on, audio recorded to sstv_rx0.wav for QSSTV/MMSSTV to decode, and
# the demod tap saved so a pass can be replayed. The reference points
# qsstv at a loopback sink; here the wav + --fifo both work. For HF
# SSTV instead use: --fc 14.230 --mode USB.
exec python -m pysdr_tpu \
    --fc 145.800 --mode NFM --fs 0.512 \
    --video-bw 25 --af-bw 5 \
    --realtime --wav sstv --save-demod \
    --web 8080 "$@"
