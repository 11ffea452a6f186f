import numpy as np
import jax.numpy as jnp
import pytest

from pysdr_tpu.ops import fir, nco, resample
from pysdr_tpu import rates


def golden_resample(x, h, up, down):
    """Direct numpy reference: zero-stuff, filter, decimate.
    y[n] = sum_i h[i] * xu[n*down - i], xu = zero-stuffed x."""
    xu = np.zeros(len(x) * up, dtype=np.complex128)
    xu[::up] = x
    yf = np.convolve(xu, h.astype(np.float64))[:len(xu)]
    return yf[::down]


@pytest.mark.parametrize("up,down", [(1, 4), (3, 128), (1, 128), (3, 125),
                                     (24, 625), (2, 3)])
def test_resample_matches_golden(up, down, rng):
    n = 4 * down * max(1, 512 // down)   # multiple of down
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    kp = 8
    h = fir.lowpass(up * kp, 0.4 * min(1.0, up / down) * 1.0, 2.0,
                    scale=float(up))
    w = jnp.asarray(resample.pack_weights(h, up, down))
    hist = jnp.zeros(resample.history_len(len(h), up), jnp.complex64)
    y, _ = resample.resample_block(jnp.asarray(x), hist, w, up=up, down=down)
    g = golden_resample(x, h, up, down)[:len(np.asarray(y))]
    np.testing.assert_allclose(np.asarray(y), g.astype(np.complex64),
                               rtol=0, atol=2e-4)


@pytest.mark.parametrize("up,down", [(3, 128), (1, 8)])
def test_streaming_equals_batch(up, down, rng):
    nblk = 4
    bl = down * 32
    x = (rng.standard_normal(nblk * bl) + 1j * rng.standard_normal(nblk * bl)
         ).astype(np.complex64)
    h = fir.lowpass(up * 16, 0.3 * up / down, 2.0, scale=float(up))
    w = jnp.asarray(resample.pack_weights(h, up, down))
    hist = jnp.zeros(resample.history_len(len(h), up), jnp.complex64)
    y_full, _ = resample.resample_block(jnp.asarray(x), hist, w,
                                        up=up, down=down)
    hist = jnp.zeros_like(hist)
    pieces = []
    for b in range(nblk):
        y, hist = resample.resample_block(jnp.asarray(x[b * bl:(b + 1) * bl]),
                                          hist, w, up=up, down=down)
        pieces.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(pieces), np.asarray(y_full),
                               rtol=0, atol=1e-5)


def test_resample_tone_frequency_maps(rng):
    # 2.048 MHz -> 48 kHz (reference srates.py table row): a 10 kHz tone
    # must come out as a 10 kHz tone at 48 kHz with ~unity gain.
    fs_in, fs_out = 2.048e6, 48e3
    up, down = rates.up_dn(fs_in, fs_out)
    assert (up, down) == (3, 128)
    plan = rates.rate_plan(fs_in, fs_out, out_block=3072)
    n = plan.in_block * 2
    t = np.arange(n) / fs_in
    x = np.exp(2j * np.pi * 10e3 * t).astype(np.complex64)
    bank = fir.video_filter_bank(fs_in, up, down, [0.0])
    w = jnp.asarray(resample.pack_weights(bank[0], up, down))
    hist = jnp.zeros(resample.history_len(bank.shape[1], up), jnp.complex64)
    y, _ = resample.resample_block(jnp.asarray(x), hist, w, up=up, down=down)
    y = np.asarray(y)[plan.out_block // 2:]  # skip transient
    # instantaneous frequency
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    f_est = np.mean(dphi) / (2 * np.pi) * fs_out
    assert abs(f_est - 10e3) < 5.0
    assert abs(np.mean(np.abs(y)) - 1.0) < 0.02


def test_fir_block_real_taps(rng):
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
         ).astype(np.complex64)
    h = fir.lowpass(101, 0.2, 2.0)
    hist = jnp.zeros(100, jnp.complex64)
    y, _ = resample.fir_block(jnp.asarray(x), hist, jnp.asarray(h))
    g = np.convolve(x, h.astype(np.float64))[:2048]
    np.testing.assert_allclose(np.asarray(y), g.astype(np.complex64),
                               atol=2e-5)


def test_fir_block_cmpx_taps(rng):
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
         ).astype(np.complex64)
    h = fir.complex_bandpass(300, 3000, 48e3, 129)
    hist = jnp.zeros(128, jnp.complex64)
    y, _ = resample.fir_block_cmpx(jnp.asarray(x), hist, jnp.asarray(h))
    g = np.convolve(x, h.astype(np.complex128))[:2048]
    np.testing.assert_allclose(np.asarray(y), g.astype(np.complex64),
                               atol=2e-5)


def test_streaming_fir_cmpx_state(rng):
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    h = jnp.asarray(fir.complex_bandpass(200, 2800, 48e3, 257))
    hist = jnp.zeros(256, jnp.complex64)
    y_full, _ = resample.fir_block_cmpx(jnp.asarray(x), hist, h)
    hist = jnp.zeros(256, jnp.complex64)
    parts = []
    for i in range(0, 4096, 1024):
        y, hist = resample.fir_block_cmpx(jnp.asarray(x[i:i + 1024]), hist, h)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(y_full),
                               atol=1e-5)


@pytest.mark.parametrize("up,down", [(3, 500), (3, 128), (1, 4),
                                     (3, 125), (24, 625)])
def test_mixed_resample_bank_matches_per_channel(up, down, rng):
    """The fused bank-level mix+resample (the NCO folded into complex
    resampler weights via the exact integer-phase factorization,
    ops/resample.mixed_resample_bank) must match the per-channel
    mix_down -> resample_block chain at float-rounding level — the
    factorization is an exact regrouping on the integer phase grid, so
    only fp reassociation separates the two forms."""
    fs = 2.048e6
    n = down * max(64, 4096 // down)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    h = fir.lowpass(up * 64, 0.4 * min(1.0, up / down), 2.0,
                    scale=float(up))
    W = resample.pack_weights(h, up, down)
    kp1 = resample.history_len(len(h), up)
    hist = (rng.standard_normal(kp1) + 1j * rng.standard_normal(kp1)
            ).astype(np.complex64)
    ks = [nco.snap_freq(f, fs) for f in (120e3, -300e3, 55e3, 731e3)]
    p0s = [7, 123456, 0, nco.DENOM - 1]
    refs = []
    for k, p0 in zip(ks, p0s):
        xp = np.concatenate([hist, x])
        ym, _ = nco.mix_down(jnp.asarray(xp), k, p0)
        ym = np.asarray(ym)
        y, _ = resample.resample_block(
            jnp.asarray(ym[kp1:]), jnp.asarray(ym[:kp1]), jnp.asarray(W),
            up=up, down=down)
        refs.append(np.asarray(y))
    refs = np.stack(refs)
    bb = np.asarray(resample.mixed_resample_bank(
        jnp.asarray(x), jnp.asarray(hist),
        jnp.asarray(np.stack([W] * len(ks))),
        jnp.asarray(ks, np.int32), jnp.asarray(p0s, np.int32),
        up=up, down=down))
    assert bb.shape == refs.shape
    err = ((np.abs(bb - refs) ** 2).mean()
           / max((np.abs(refs) ** 2).mean(), 1e-30))
    snr_db = -10 * np.log10(max(err, 1e-30))
    assert snr_db > 100.0, snr_db


def test_mul_mod_matches_python():
    for k in (0, 1, 12345, nco.DENOM - 1, 54321):
        for c in (1, 2, 500, 625, 128, nco.DENOM - 1, 3):
            got = int(nco.mul_mod(jnp.int32(k), c))
            assert got == (k * c) % nco.DENOM, (k, c, got)


def test_resampler_antiimaging_when_upsampling():
    """up > down (e.g. a 32 kHz channel resampled to 48 kHz): the
    prototype must also reject the zero-stuffing images beyond the
    INPUT Nyquist — capping only at the output Nyquist (22 kHz here)
    let input images at 16-22 kHz pass unattenuated."""
    from pysdr_tpu.ops import fir

    h = fir.video_filter_bank(32e3, 3, 2, [0.0],
                              taps_per_phase=32)[0]
    f, mag = fir.freq_response(h, 32e3 * 3)
    mag = mag - mag[np.argmin(np.abs(f))]          # normalize passband
    stop = mag[(np.abs(f) > 17.5e3)]
    assert stop.max() < -40.0, stop.max()
    # and the passband below the input Nyquist still passes
    pb = mag[(np.abs(f) < 12e3)]
    assert pb.min() > -2.0, pb.min()
