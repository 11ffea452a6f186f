import numpy as np
import jax.numpy as jnp
import pytest

from pysdr_tpu.ops import agc as agc_ops
from pysdr_tpu.ops import demod
from pysdr_tpu.tables import Mode


FS = 48e3
DESIGN = demod.DemodDesign(fs_out=FS)
CT = jnp.asarray(DESIGN.carrier_filter())
PT = jnp.asarray(DESIGN.pilot_filter())


def run_demod(iq, mode, n_blocks=1, **kw):
    p = demod.make_params(DESIGN, mode, **kw)
    st = demod.init_state(DESIGN)
    outs = []
    blocks = np.split(iq, n_blocks)
    for b in blocks:
        audio, st = demod.demod_block(jnp.asarray(b), st, p, DESIGN, CT, PT)
        outs.append(np.asarray(audio))
    return np.concatenate(outs)


def tone_snr_db(audio, f, fs=FS, skip=2048):
    """SNR of a real audio signal against a pure tone at f."""
    a = audio[skip:] - np.mean(audio[skip:])
    n = len(a)
    t = np.arange(skip, skip + n) / fs
    ref = np.exp(-2j * np.pi * f * t)
    amp = 2 * np.abs(np.sum(a * ref)) / n
    sig = amp ** 2 / 2
    noise = np.mean(a ** 2) - sig
    return 10 * np.log10(sig / max(noise, 1e-20))


def test_am_envelope():
    n = 16384
    t = np.arange(n) / FS
    m = 0.5 * np.sin(2 * np.pi * 1000 * t)
    iq = ((1 + m) * np.exp(2j * np.pi * 3.0 * t)).astype(np.complex64)
    audio = run_demod(iq, Mode.AM, n_blocks=4, agc_on=False).real
    assert tone_snr_db(audio, 1000) > 30


def test_am_sync_carrier_recovery():
    n = 32768
    t = np.arange(n) / FS
    m = 0.5 * np.sin(2 * np.pi * 800 * t)
    # carrier offset 40 Hz (inside the ±100 Hz recovery band) + phase
    iq = ((1 + m) * np.exp(2j * np.pi * 40.0 * t + 1j * 0.7)
          ).astype(np.complex64)
    audio = run_demod(iq, Mode.AM_SYNC, n_blocks=8, agc_on=False).real
    assert tone_snr_db(audio, 800, skip=8192) > 25


def test_usb_one_sided():
    n = 16384
    t = np.arange(n) / FS
    # one tone in the USB passband, one image in LSB that must be rejected
    iq = (np.exp(2j * np.pi * 1500 * t)
          + np.exp(-2j * np.pi * 900 * t)).astype(np.complex64)
    audio = run_demod(iq, Mode.USB, n_blocks=4, agc_on=False).real
    a = audio[4096:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    freqs = np.fft.rfftfreq(len(a), 1 / FS)
    p1500 = spec[np.argmin(np.abs(freqs - 1500))]
    p900 = spec[np.argmin(np.abs(freqs - 900))]
    assert 20 * np.log10(p1500 / max(p900, 1e-12)) > 40


def test_lsb_rejects_usb():
    n = 16384
    t = np.arange(n) / FS
    iq = (np.exp(2j * np.pi * 1500 * t)
          + np.exp(-2j * np.pi * 900 * t)).astype(np.complex64)
    audio = run_demod(iq, Mode.LSB, n_blocks=4, agc_on=False).real
    a = audio[4096:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    freqs = np.fft.rfftfreq(len(a), 1 / FS)
    p1500 = spec[np.argmin(np.abs(freqs - 1500))]
    p900 = spec[np.argmin(np.abs(freqs - 900))]
    assert 20 * np.log10(p900 / max(p1500, 1e-12)) > 40


def test_cw_beat_note():
    n = 16384
    t = np.arange(n) / FS
    iq = np.exp(2j * np.pi * 0.0 * t).astype(np.complex64)  # carrier at DC
    audio = run_demod(iq, Mode.CW, n_blocks=4, agc_on=False,
                      bfo_hz=700.0).real
    assert tone_snr_db(audio, 700) > 30


def test_nfm_discriminator():
    n = 32768
    t = np.arange(n) / FS
    f_mod, dev = 1000.0, 5000.0
    phase = dev / f_mod * np.sin(2 * np.pi * f_mod * t)
    iq = np.exp(1j * phase).astype(np.complex64)
    audio = run_demod(iq, Mode.NFM, n_blocks=8, agc_on=False).real
    snr = tone_snr_db(audio, f_mod)
    assert snr > 30
    # full deviation maps to ~unit peak amplitude
    amp = np.sqrt(2 * np.mean((audio[4096:] - np.mean(audio[4096:])) ** 2))
    assert 0.7 < amp < 1.2


def test_nfm_streaming_equals_batch():
    n = 16384
    t = np.arange(n) / FS
    phase = 2.0 * np.sin(2 * np.pi * 700 * t)
    iq = np.exp(1j * phase).astype(np.complex64)
    a1 = run_demod(iq, Mode.NFM, n_blocks=1, agc_on=False)
    a8 = run_demod(iq, Mode.NFM, n_blocks=8, agc_on=False)
    np.testing.assert_allclose(a8, a1, atol=1e-4)


def test_iq_passthrough():
    n = 8192
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
          ).astype(np.complex64)
    audio = run_demod(iq, Mode.IQ, n_blocks=2, agc_on=False)
    np.testing.assert_allclose(audio, iq, atol=1e-5)


def test_wfm_mono():
    fs = 192e3
    design = demod.DemodDesign(fs_out=fs)
    ct, pt = jnp.asarray(design.carrier_filter()), jnp.asarray(
        design.pilot_filter())
    n = 65536
    t = np.arange(n) / fs
    f_mod, dev = 1000.0, 75e3
    phase = dev / f_mod * np.sin(2 * np.pi * f_mod * t)
    iq = np.exp(1j * phase).astype(np.complex64)
    p = demod.make_params(design, Mode.WFM, af_bw_hz=15e3, agc_on=False)
    st = demod.init_state(design)
    audio, st = demod.demod_block(jnp.asarray(iq), st, p, design, ct, pt)
    a = np.asarray(audio).real
    assert tone_snr_db(a, f_mod, fs=fs, skip=8192) > 25


def test_wfm2_stereo_separation():
    """Synthesized FM stereo multiplex (19 kHz pilot + DSB-SC L-R on the
    38 kHz subcarrier): the decoder must put the left tone in the left
    channel and the right tone in the right channel with real separation.
    Exercises the pilot-squaring path (demod.py WFM2)."""
    fs = 192e3
    design = demod.DemodDesign(fs_out=fs)
    ct, pt = jnp.asarray(design.carrier_filter()), jnp.asarray(
        design.pilot_filter())
    n = 1 << 17
    t = np.arange(n) / fs
    fl, fr = 800.0, 2000.0
    L = 0.8 * np.sin(2 * np.pi * fl * t)
    R = 0.8 * np.sin(2 * np.pi * fr * t)
    theta = 2 * np.pi * 19e3 * t
    # STANDARD broadcast composite (FCC 73.322 / BS.450): pilot sin,
    # (L-R) DSB on sin(2*theta) — the subcarrier zero-crosses with the
    # pilot. The decoder regenerates sin(2*pilot_phase); round 4 fixed
    # a 90-degree convention error that this synthesis used to share.
    mux = 0.45 * (L + R) + 0.1 * np.sin(theta) + 0.45 * (L - R) * \
        np.sin(2 * theta)
    dev = 75e3
    phase = 2 * np.pi * dev * np.cumsum(mux) / fs
    iq = np.exp(1j * phase).astype(np.complex64)
    p = demod.make_params(design, Mode.WFM2, af_bw_hz=15e3, agc_on=False)
    st = demod.init_state(design)
    audio, st = demod.demod_block(jnp.asarray(iq), st, p, design, ct, pt)
    a = np.asarray(audio)
    left, right = a.real[n // 2:], a.imag[n // 2:]

    def tone_power(x, f):
        w = np.hanning(len(x))
        spec = np.abs(np.fft.rfft(x * w))
        freqs = np.fft.rfftfreq(len(x), 1 / fs)
        return spec[np.argmin(np.abs(freqs - f))]

    sep_l = 20 * np.log10(tone_power(left, fl) /
                          max(tone_power(right, fl), 1e-12))
    sep_r = 20 * np.log10(tone_power(right, fr) /
                          max(tone_power(left, fr), 1e-12))
    assert sep_l > 15, sep_l
    assert sep_r > 15, sep_r
    # and the mono content decodes cleanly in both channels
    assert tone_snr_db(left, fl, fs=fs, skip=0) > 15


def test_agc_levels_output(rng):
    x = (0.001 * rng.standard_normal(48000)).astype(np.float32)
    p = agc_ops.AGCParams()
    env = agc_ops.init_state()
    y, env, gain = agc_ops.agc_block(jnp.asarray(x), env, p)
    y = np.asarray(y)
    # output should be pulled up toward ref level
    rms_in = np.sqrt(np.mean(x ** 2))
    rms_out = np.sqrt(np.mean(y[10000:] ** 2))
    assert rms_out > 20 * rms_in


def test_squelch_gates_noise(rng):
    # pure noise, squelch on -> output muted after gate settles
    n = 16384
    iq = (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    audio_open = run_demod(iq, Mode.NFM, n_blocks=4, agc_on=False,
                           squelch_db=-150.0)
    audio_gated = run_demod(iq, Mode.NFM, n_blocks=4, agc_on=False,
                            squelch_db=20.0)
    assert np.mean(np.abs(audio_gated[-4096:])) < \
        0.2 * np.mean(np.abs(audio_open[-4096:]))
