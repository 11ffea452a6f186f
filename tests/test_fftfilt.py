"""Overlap-save FFT filter == direct FIR, op-level and through the demod
(the reference convolver.convolve_fast equivalent, receiver.py:207)."""

import numpy as np
import jax.numpy as jnp

from pysdr_tpu.ops import fftfilt, resample
from pysdr_tpu.ops import demod
from pysdr_tpu.tables import Mode


def test_matches_direct_fir(rng):
    t = 127
    taps = (rng.standard_normal(t) + 1j * rng.standard_normal(t)
            ).astype(np.complex64)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    hist = np.zeros(t - 1, np.complex64)
    y_fft, h_fft = fftfilt.fft_fir_block(jnp.asarray(x), jnp.asarray(hist),
                                         jnp.asarray(taps))
    y_dir, h_dir = resample.fir_block_cmpx(jnp.asarray(x),
                                           jnp.asarray(hist),
                                           jnp.asarray(taps))
    np.testing.assert_allclose(np.asarray(y_fft), np.asarray(y_dir),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_fft), np.asarray(h_dir))


def test_streaming_equals_batch(rng):
    t = 64
    taps = (rng.standard_normal(t) + 1j * rng.standard_normal(t)
            ).astype(np.complex64)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64)

    def run(blocks):
        hist = jnp.zeros(t - 1, jnp.complex64)
        outs = []
        for b in np.split(x, blocks):
            y, hist = fftfilt.fft_fir_block(jnp.asarray(b), hist,
                                            jnp.asarray(taps))
            outs.append(np.asarray(y))
        return np.concatenate(outs)

    np.testing.assert_allclose(run(4), run(1), atol=2e-4)


def test_demod_fft_af_equals_direct():
    """Full demod with fft_af=True matches the direct path across modes."""
    fs = 48e3
    n = 16384
    t_ax = np.arange(n) / fs
    m = 0.5 * np.sin(2 * np.pi * 1000 * t_ax)
    iq = ((1 + m) * np.exp(2j * np.pi * 30.0 * t_ax)).astype(np.complex64)

    for mode in (Mode.AM, Mode.USB, Mode.NFM):
        outs = []
        for fft_af in (False, True):
            design = demod.DemodDesign(fs_out=fs, fft_af=fft_af)
            ct = jnp.asarray(design.carrier_filter())
            pt = jnp.asarray(design.pilot_filter())
            p = demod.make_params(design, mode, agc_on=False)
            st = demod.init_state(design)
            audio, _ = demod.demod_block(jnp.asarray(iq), st, p, design,
                                         ct, pt)
            outs.append(np.asarray(audio))
        np.testing.assert_allclose(outs[1], outs[0], atol=5e-4,
                                   err_msg=str(mode))
