"""Regenerate the committed capture corpus (deterministic).

The reference keeps an annotated catalogue of recorded captures with
expected qualitative outcomes as its de-facto regression suite
(/root/reference/replay:23-75, rtty:1-40). This corpus formalizes that:
each fixture is a small int8 .dat capture with a PINNED expected outcome
asserted by tests/test_corpus.py. See README.md here for the catalogue.

    python tests/fixtures/generate.py      # rewrites the .dat files
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pysdr_tpu.io import datfile, synth          # noqa: E402
from pysdr_tpu.models import rtty as rtty_mod    # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def am_tones():
    """Two AM stations: 400 Hz @ 100.000 MHz, 800 Hz @ 100.040 MHz."""
    fs, n = 256e3, int(256e3 * 1.5)
    x = synth.render(
        [synth.SignalSpec(offset_hz=60e3, mode="am", amplitude=0.4,
                          audio_hz=400.0),
         synth.SignalSpec(offset_hz=100e3, mode="am", amplitude=0.4,
                          audio_hz=800.0)],
        fs, n, noise_rms=0.005, seed=11)
    w = datfile.DatWriter(os.path.join(HERE, "am_tones.dat"), fs=fs,
                          fc=100e6 - 60e3, dtype="int8")
    w.save_data(x)
    w.close()


def rtty_cq():
    """45.45-baud RTTY, mark 1 kHz above a 100.000 MHz dial."""
    fs = 96e3
    d = rtty_mod.RTTYDesign(fs=fs)
    x = 0.5 * rtty_mod.synthesize_rtty("RYRY CQ CQ DE AA2IL AA2IL K", d,
                                       carrier_hz=24e3 + 1000.0)
    w = datfile.DatWriter(os.path.join(HERE, "rtty_cq.dat"), fs=fs,
                          fc=100e6 - 24e3, dtype="int8")
    w.save_data(x.astype(np.complex64))
    w.close()


def nfm_squelch_drop():
    """NFM, 700 Hz tone; the carrier DROPS at t=1.2 s — squelch must
    close on the tail (reference sigs/squelch.m behavior)."""
    fs, dur = 256e3, 2.0
    n = int(fs * dur)
    n_on = int(fs * 1.2)
    x = synth.render(
        [synth.SignalSpec(offset_hz=60e3, mode="fm", amplitude=0.5,
                          audio_hz=700.0)],
        fs, n, noise_rms=0.0, seed=5)
    x = np.asarray(x)
    rng = np.random.default_rng(6)
    x[n_on:] = 0.004 / np.sqrt(2) * (
        rng.standard_normal(n - n_on)
        + 1j * rng.standard_normal(n - n_on)).astype(np.complex64)
    w = datfile.DatWriter(os.path.join(HERE, "nfm_squelch_drop.dat"),
                          fs=fs, fc=100e6 - 60e3, dtype="int8")
    w.save_data(x)
    w.close()


if __name__ == "__main__":
    am_tones()
    rtty_cq()
    nfm_squelch_drop()
    for f in sorted(os.listdir(HERE)):
        if f.endswith(".dat"):
            print(f, os.path.getsize(os.path.join(HERE, f)))
