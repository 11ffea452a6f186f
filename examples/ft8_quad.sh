#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# Multi-band FT8/FT4 monitoring (the reference's FT8dual/FT8tri
# launchers): the --ft8/--ft4 band-list flags expand the RX layout in
# one step — here 30m+20m FT8 plus both FT4 slots = 4 USB receivers
# inside one 5 MHz passband (reference FRQS="10136 14074", FS=5).
# --hamlib exposes each RX as a rig on ports 4575+i so one WSJT-X
# instance per RX can tune/decode it (reference WSJTX settings block);
# --fifo routes RX0's audio as raw s16le PCM into a named pipe for
# the decoder to read (the start_loopback analogue). Swap in
# --rtl-tcp HOST:PORT for a real dongle.
exec python -m pysdr_tpu \
    --ft8 30m 20m --ft4 30m 20m \
    --fs 5.0 --video-bw 45 --af-bw 5 \
    --realtime --hamlib --fifo /tmp/pysdr_ft8.pcm \
    --web 8080 "$@"
