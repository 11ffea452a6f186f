#!/bin/sh
# run from anywhere: use the checkout when not pip-installed
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# Replay the committed capture corpus (tests/fixtures/README.md is the
# annotated catalogue) through the full chain. Wavs land in the CALLER's
# directory.
set -e
FIX="$REPO/tests/fixtures"
python -m pysdr_tpu --replay "$FIX/am_tones.dat" --no-loop \
    --fc 100.0 100.04 --mode AM --video-bw 8 --block 4096 --wav am_corpus
python -m pysdr_tpu --replay "$FIX/nfm_squelch_drop.dat" --no-loop \
    --fc 100.0 --mode NFM --squelch 6 --block 4096 --wav nfm_corpus
echo "wrote am_corpus_rx{0,1}.wav (400/800 Hz) and nfm_corpus_rx0.wav"
