"""ChannelizerBank: N-channel channelize+demod, validated functionally and
against an equivalent bank of independent ReceiverBank channels (the
reference's per-RX chains generalized — receiver.py:825-835; BASELINE
config 5)."""

import numpy as np
import pytest

from pysdr_tpu.config import PipelineConfig, ReceiverConfig
from pysdr_tpu.io import synth
from pysdr_tpu.models.channelizer_bank import (ChannelizerBank,
                                               ChannelizerBankConfig,
                                               ChannelSettings)
from pysdr_tpu.models.receiver import ReceiverBank
from pysdr_tpu.tables import Mode

N = 8
FS_IN = N * 48e3          # fs_ch = 48k = fs_out (up/down = 1/1)
FC = 100e6


def synth_am(n, fs, stations):
    """stations: list of (offset_hz, audio_hz, amp)."""
    t = np.arange(n) / fs
    x = np.zeros(n, np.complex64)
    for off, fa, amp in stations:
        m = 0.5 * np.sin(2 * np.pi * fa * t)
        x = x + amp * (1 + m) * np.exp(2j * np.pi * off * t)
    return x.astype(np.complex64)


def tone_snr_db(a, f, fs=48e3, skip=2048):
    a = a[skip:] - np.mean(a[skip:])
    n = len(a)
    t = np.arange(skip, skip + n) / fs
    ref = np.exp(-2j * np.pi * f * t)
    amp = 2 * np.abs(np.sum(a * ref)) / n
    sig = amp ** 2 / 2
    noise = np.mean(a ** 2) - sig
    return 10 * np.log10(sig / max(noise, 1e-20))


def run_bank(bank, x, n_blocks):
    outs = []
    for b in np.split(x, n_blocks):
        outs.append(bank.step(b))
    return np.concatenate(outs, axis=-1)


@pytest.fixture(scope="module")
def cbank():
    cfg = ChannelizerBankConfig(
        fs_in=FS_IN, n_channels=N, fs_out=48e3, out_block=4096, fc_hz=FC,
        channels=tuple(ChannelSettings(mode=Mode.AM, agc_enabled=False)
                       for _ in range(N)))
    return ChannelizerBank(cfg)


def test_per_channel_demod(cbank):
    """AM stations at three channel centers decode in exactly those
    channels; idle channels stay quiet."""
    offs = np.fft.fftfreq(N, 1.0 / FS_IN)
    stations = [(offs[1], 400.0, 1.0), (offs[3], 700.0, 1.0),
                (offs[6], 1100.0, 1.0)]   # ch6 = negative freq side
    n_blocks = 4
    x = synth_am(cbank.in_block * n_blocks, FS_IN, stations)
    audio = run_bank(cbank, x, n_blocks)
    assert audio.shape == (N, 4096 * n_blocks)
    assert tone_snr_db(audio[1].real, 400.0) > 20
    assert tone_snr_db(audio[3].real, 700.0) > 20
    assert tone_snr_db(audio[6].real, 1100.0) > 20
    # adjacent-channel rejection
    act = np.mean(np.abs(audio[1, 4096:]))
    for idle in (2, 4, 5, 7):
        assert np.mean(np.abs(audio[idle, 4096:])) < 0.05 * act, idle


def test_streaming_equals_batch():
    cfg = ChannelizerBankConfig(
        fs_in=FS_IN, n_channels=N, fs_out=48e3, out_block=2048, fc_hz=FC,
        channels=tuple(ChannelSettings(mode=Mode.AM, agc_enabled=False)
                       for _ in range(N)))
    offs = np.fft.fftfreq(N, 1.0 / FS_IN)
    x = synth_am(cfg.plan.in_block * N * 4, FS_IN,
                 [(offs[2], 500.0, 1.0)])
    b1 = ChannelizerBank(cfg)
    a1 = run_bank(b1, x, 1)
    b2 = ChannelizerBank(cfg)
    a2 = run_bank(b2, x, 4)
    np.testing.assert_allclose(a2, a1, atol=2e-4)


def test_fine_retune(cbank):
    """A station 5 kHz off channel 2's center decodes after a fine
    retune (the FreqSelect analogue inside a channel)."""
    offs = np.fft.fftfreq(N, 1.0 / FS_IN)
    x = synth_am(cbank.in_block * 4, FS_IN, [(offs[2] + 5e3, 600.0, 1.0)])
    cbank.retune(2, 5e3)
    try:
        audio = run_bank(cbank, x, 4)
        assert tone_snr_db(audio[2].real, 600.0) > 15
    finally:
        cbank.retune(2, 0.0)


def test_matches_independent_receiver_bank():
    """Channelized demod == N independent mix+decimate+demod chains
    within an SNR bound (the two front-end filters differ, so compare
    after lag alignment and optimal scaling)."""
    n_use = 4
    offs = np.fft.fftfreq(N, 1.0 / FS_IN)
    use_ch = [1, 2, 3, 6]
    stations = [(offs[c], 300.0 * (i + 1), 1.0)
                for i, c in enumerate(use_ch)]
    ccfg = ChannelizerBankConfig(
        fs_in=FS_IN, n_channels=N, fs_out=48e3, out_block=4096, fc_hz=FC,
        channels=tuple(ChannelSettings(mode=Mode.AM, agc_enabled=False)
                       for _ in range(N)))
    cb = ChannelizerBank(ccfg)
    n_blocks = 4
    x = synth_am(cb.in_block * n_blocks, FS_IN, stations)
    a_chan = run_bank(cb, x, n_blocks)

    rcfg = PipelineConfig(
        fs_in=FS_IN, fs_out=48e3, out_block=4096, foffset_hz=offs[use_ch[0]],
        receivers=tuple(ReceiverConfig(fc_hz=FC + offs[c], mode=Mode.AM,
                                       agc_enabled=False)
                        for c in use_ch))
    rb = ReceiverBank(rcfg)
    a_ref = run_bank(rb, x, n_blocks)

    for i, c in enumerate(use_ch):
        ref = a_ref[i].real[8192:]
        out = a_chan[c].real[8192:]
        ref = ref - ref.mean()
        out = out - out.mean()
        # lag-align (different front-end group delays)
        corr = np.correlate(out, ref[512:-512], mode="valid")
        lag = np.argmax(np.abs(corr))
        o = out[lag:lag + len(ref) - 1024]
        r = ref[512:512 + len(o)]
        scale = np.dot(o, r) / np.dot(o, o)
        err = r - scale * o
        snr = 10 * np.log10(np.mean(r ** 2) / max(np.mean(err ** 2), 1e-20))
        assert snr > 13, (c, snr)


def test_decimating_plan():
    """fs_ch != fs_out: 192k channels resampled to 48k (the BASELINE
    config-5 shape at small scale)."""
    n = 4
    fs_in = n * 192e3
    cfg = ChannelizerBankConfig(
        fs_in=fs_in, n_channels=n, fs_out=48e3, out_block=2048, fc_hz=FC,
        channels=tuple(ChannelSettings(mode=Mode.AM, agc_enabled=False)
                       for _ in range(n)))
    cb = ChannelizerBank(cfg)
    assert cb.plan.up == 1 and cb.plan.down == 4
    offs = np.fft.fftfreq(n, 1.0 / fs_in)
    x = synth_am(cb.in_block * 3, fs_in, [(offs[1], 800.0, 1.0)])
    audio = run_bank(cb, x, 3)
    assert audio.shape == (n, 2048 * 3)
    assert tone_snr_db(audio[1].real, 800.0) > 20


def test_mixed_modes_and_mute(cbank):
    offs = np.fft.fftfreq(N, 1.0 / FS_IN)
    t = np.arange(cbank.in_block * 4) / FS_IN
    # NFM station on ch 5
    dev, fa = 5e3, 900.0
    phase = dev / fa * np.sin(2 * np.pi * fa * t)
    x = (np.exp(2j * np.pi * offs[5] * t + 1j * phase)
         ).astype(np.complex64)
    cbank.set_mode(5, Mode.NFM)
    try:
        audio = run_bank(cbank, x, 4)
        assert tone_snr_db(audio[5].real, fa) > 15
        cbank.set_mute(5, True)
        audio2 = run_bank(cbank, x, 4)
        assert np.max(np.abs(audio2[5])) == 0.0
    finally:
        cbank.set_mute(5, False)
        cbank.set_mode(5, Mode.AM)


def test_nfm_af_bw_does_not_clip_predemod():
    """Round-4 fix: the pre-demod video row used to be selected from
    af_bw_hz, so narrowing the AUDIO filter of an NFM channel amputated
    the FM sidebands before the discriminator. A 5 kHz AF filter on an
    NFM channel must still demodulate cleanly."""
    n = 8
    fs_in = n * 96e3
    cfg = ChannelizerBankConfig(
        fs_in=fs_in, n_channels=n, fs_out=48e3, out_block=4096,
        fc_hz=100e6,
        channels=tuple(ChannelSettings(mode=Mode.NFM, af_bw_hz=5e3,
                                       agc_enabled=False)
                       for _ in range(n)))
    cb = ChannelizerBank(cfg)
    offs = cfg.center_freqs_hz() - cfg.fc_hz
    x = synth.render(
        [synth.SignalSpec(offset_hz=float(offs[2]), mode="fm",
                          amplitude=0.5, audio_hz=700.0)],
        fs_in, cb.in_block * 4, noise_rms=0.0)
    outs = [cb.step(b) for b in np.split(np.asarray(x), 4)]
    a = np.concatenate(outs, axis=1)[2].real
    seg = a[len(a) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1 / 48e3)
    pk = f[5 + np.argmax(sp[5:])]
    assert abs(pk - 700.0) < 10.0, pk
    snr = 20 * np.log10(sp.max() / (np.median(sp[5:]) + 1e-12))
    assert snr > 40.0, snr
