import numpy as np
import jax.numpy as jnp

from pysdr_tpu.ops import spectrum


def test_periodogram_tone_peak():
    fs, n, nfft = 48e3, 8192, 1024
    d = spectrum.SpectrumDesign(fs=fs, nfft=nfft)
    t = np.arange(n) / fs
    f0 = 6000.0
    x = (np.exp(2j * np.pi * f0 * t)).astype(np.complex64)
    psd = np.asarray(spectrum.periodogram(
        jnp.asarray(x), jnp.asarray(d.window_array()),
        nfft=nfft, hop=d.hop))
    freqs = d.freqs_hz()
    fpk = freqs[np.argmax(psd)]
    assert abs(fpk - f0) < fs / nfft


def test_periodogram_matches_scipy_welch():
    import scipy.signal as ss
    fs, n, nfft = 48e3, 16384, 1024
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    d = spectrum.SpectrumDesign(fs=fs, nfft=nfft)
    psd = np.asarray(spectrum.periodogram(
        jnp.asarray(x), jnp.asarray(d.window_array()),
        nfft=nfft, hop=d.hop))
    f_sp, p_sp = ss.welch(x, fs=fs, window=np.hanning(nfft)
                          / np.sqrt(np.mean(np.hanning(nfft)**2)),
                          nperseg=nfft, noverlap=nfft - d.hop,
                          return_onesided=False, detrend=False,
                          scaling="density")
    p_sp_db = 10 * np.log10(np.fft.fftshift(p_sp) * fs)
    # same shape to within ~1 dB on average (segment averaging differs
    # slightly at the block edge)
    assert np.mean(np.abs(psd - p_sp_db)) < 1.5


def test_waterfall_roll_and_shift():
    wf = jnp.zeros((10, 64))
    row = jnp.arange(64, dtype=jnp.float32)
    wf2 = spectrum.waterfall_push(wf, row)
    assert np.allclose(np.asarray(wf2)[0], np.arange(64))
    wf3 = spectrum.waterfall_shift(wf2, jnp.int32(3))
    assert np.asarray(wf3)[0, 3] == 0.0


def test_find_peaks():
    x = np.full(256, -100.0, np.float32)
    x[40] = -20.0
    x[41] = -30.0   # within min_dist of 40 -> suppressed
    x[120] = -10.0
    idx, vals = spectrum.find_peaks(jnp.asarray(x), -50.0, max_peaks=4,
                                    min_dist=8)
    idx = set(int(i) for i in np.asarray(idx) if i >= 0)
    assert idx == {40, 120}


def test_clamp_and_image():
    wf = jnp.asarray(np.linspace(-120, -20, 256, dtype=np.float32)[None, :]
                     .repeat(4, 0))
    c = np.asarray(spectrum.clamp_dynamic_range(wf, jnp.float32(40.0)))
    assert c.min() >= -60.0 - 1e-5
    img = np.asarray(spectrum.to_image_u8(wf, 60.0))
    assert img.dtype == np.uint8 and img.max() == 255


def test_periodogram_short_block_zero_pads():
    """A block shorter than nfft must zero-pad, not clamp-gather (the
    old behavior replicated the final sample hundreds of times into a
    bogus spectrum)."""
    import jax.numpy as jnp

    from pysdr_tpu.ops import spectrum as sp

    fs, nfft = 48e3, 1024
    n = 128
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 6000.0 * t).astype(np.complex64)
    w = jnp.asarray(np.hanning(nfft).astype(np.float32))
    p = np.asarray(sp.periodogram(jnp.asarray(x), w, nfft=nfft, hop=nfft))
    f = np.fft.fftshift(np.fft.fftfreq(nfft, 1 / fs))
    pk = f[np.argmax(p)]
    assert abs(pk - 6000.0) < 2 * fs / n, pk      # tone still localized
    # DC must not dominate (the clamp bug piled the last sample at DC)
    assert p[np.argmin(np.abs(f))] < p.max() - 3.0


def test_find_peaks_plateau_single_flag():
    """An equal-valued plateau yields ONE peak, not one per tied bin
    (ties used to defeat the min_dist suppression)."""
    import jax.numpy as jnp

    from pysdr_tpu.ops import spectrum as sp

    row = np.full(64, -80.0, np.float32)
    row[30:34] = -10.0                             # 4-bin flat plateau
    idx, vals = sp.find_peaks(jnp.asarray(row), height_db=-40.0,
                              min_dist=8, max_peaks=8)
    idx = np.asarray(idx)
    got = idx[idx >= 0]
    assert len(got) == 1 and got[0] == 30, idx
