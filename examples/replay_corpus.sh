#!/bin/sh
# Replay the committed capture corpus (tests/fixtures/README.md is the
# annotated catalogue) through the full chain.
set -e
cd "$(dirname "$0")/.."
python -m pysdr_tpu --replay tests/fixtures/am_tones.dat --no-loop \
    --fc 100.0 100.04 --mode AM --video-bw 8 --block 4096 --wav am_corpus
python -m pysdr_tpu --replay tests/fixtures/nfm_squelch_drop.dat --no-loop \
    --fc 100.0 --mode NFM --squelch 6 --block 4096 --wav nfm_corpus
echo "wrote am_corpus_rx{0,1}.wav (400/800 Hz) and nfm_corpus_rx0.wav"
