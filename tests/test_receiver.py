"""End-to-end: synthetic RF passband -> ReceiverBank -> audio.

This is the "am.py moment" (SURVEY.md §7.3): the minimum full chain
replay -> mix -> decimate -> demod -> AGC -> audio, validated on signal
content, streaming equivalence, and control-plane changes."""

import numpy as np
import jax.numpy as jnp

from pysdr_tpu.config import PipelineConfig, ReceiverConfig
from pysdr_tpu.io import synth
from pysdr_tpu.models.receiver import ReceiverBank
from pysdr_tpu.tables import Mode

FS = 2.048e6
FC0 = 100e6  # arbitrary RF center for channel 0


def tone_snr_db(audio, f, fs, skip):
    a = audio[skip:] - np.mean(audio[skip:])
    n = len(a)
    t = np.arange(skip, skip + n) / fs
    ref = np.exp(-2j * np.pi * f * t)
    amp = 2 * np.abs(np.sum(a * ref)) / n
    sig = amp ** 2 / 2
    noise = np.mean(a ** 2) - sig
    return 10 * np.log10(sig / max(noise, 1e-20))


def run_bank(bank, specs, n_blocks, noise=0.0):
    src = synth.SynthSource(specs, fs=FS, noise_rms=noise)
    outs = []
    for _ in range(n_blocks):
        x = jnp.asarray(src.read_data(bank.design.in_block))
        outs.append(np.asarray(bank.step(x)))
    return np.concatenate(outs, axis=1)  # (n_rx, total)


def test_single_am_channel_end_to_end():
    cfg = PipelineConfig(
        fs_in=FS, fs_out=48e3, out_block=4096, foffset_hz=100e3,
        receivers=(ReceiverConfig(fc_hz=FC0, mode=Mode.AM,
                                  agc_enabled=False),))
    bank = ReceiverBank(cfg)
    # emitter exactly at channel 0's offset inside the passband
    specs = [synth.SignalSpec(offset_hz=100e3, mode="am", audio_hz=1000.0)]
    audio = run_bank(bank, specs, 6)[0].real
    snr = tone_snr_db(audio, 1000.0, bank.design.fs_out, skip=8192)
    assert snr > 25, snr


def test_three_channel_mixed_modes():
    cfg = PipelineConfig(
        fs_in=FS, fs_out=48e3, out_block=4096, foffset_hz=200e3,
        receivers=(
            ReceiverConfig(fc_hz=FC0, mode=Mode.AM, agc_enabled=False),
            ReceiverConfig(fc_hz=FC0 + 150e3, mode=Mode.NFM,
                           agc_enabled=False),
            ReceiverConfig(fc_hz=FC0 - 250e3, mode=Mode.USB,
                           agc_enabled=False),
        ))
    bank = ReceiverBank(cfg)
    offs = cfg.channel_offsets_hz()
    specs = [
        synth.SignalSpec(offset_hz=offs[0], mode="am", audio_hz=800.0),
        synth.SignalSpec(offset_hz=offs[1], mode="fm", audio_hz=1100.0,
                         deviation_hz=5e3),
        synth.SignalSpec(offset_hz=offs[2], mode="usb", audio_hz=1500.0),
    ]
    audio = run_bank(bank, specs, 6)
    fs_out = bank.design.fs_out
    assert tone_snr_db(audio[0].real, 800.0, fs_out, 8192) > 20
    assert tone_snr_db(audio[1].real, 1100.0, fs_out, 8192) > 20
    assert tone_snr_db(audio[2].real, 1500.0, fs_out, 8192) > 20


def test_streaming_invariance():
    cfg = PipelineConfig(
        fs_in=FS, fs_out=48e3, out_block=2048, foffset_hz=50e3,
        receivers=(ReceiverConfig(fc_hz=FC0, mode=Mode.AM,
                                  agc_enabled=False),))
    specs = [synth.SignalSpec(offset_hz=50e3, mode="am", audio_hz=700.0)]
    n_blocks = 4
    b1 = ReceiverBank(cfg)
    a_stream = run_bank(b1, specs, n_blocks)
    # same data through one big config
    cfg2 = PipelineConfig(
        fs_in=FS, fs_out=48e3, out_block=2048 * n_blocks, foffset_hz=50e3,
        receivers=cfg.receivers)
    b2 = ReceiverBank(cfg2)
    a_big = run_bank(b2, specs, 1)
    # block rounding to multiples of UP may differ by a few samples
    n = min(a_stream.shape[1], a_big.shape[1])
    np.testing.assert_allclose(a_stream[0][:n], a_big[0][:n], atol=2e-4)


def test_retune_no_recompile_and_takes_effect():
    cfg = PipelineConfig(
        fs_in=FS, fs_out=48e3, out_block=4096, foffset_hz=100e3,
        receivers=(ReceiverConfig(fc_hz=FC0, mode=Mode.AM,
                                  agc_enabled=False),))
    bank = ReceiverBank(cfg)
    # emitter NOT at the tuned offset: weak audio
    specs = [synth.SignalSpec(offset_hz=130e3, mode="am", audio_hz=900.0)]
    _ = run_bank(bank, specs, 2)
    compiles_before = bank._step._cache_size()
    # retune channel 0 onto the emitter: fc + 30 kHz
    bank.retune(0, FC0 + 30e3)
    # NOTE: retuning RX0 in the reference moves the SDR center; here the
    # synth source stays fixed, so this acts like a sub-RX retune.
    audio = run_bank(bank, specs, 6)[0].real
    assert bank._step._cache_size() == compiles_before  # pure data swap
    assert tone_snr_db(audio, 900.0, bank.design.fs_out, 8192) > 20


def test_mode_change_no_recompile():
    cfg = PipelineConfig(
        fs_in=FS, fs_out=48e3, out_block=2048, foffset_hz=100e3,
        receivers=(ReceiverConfig(fc_hz=FC0, mode=Mode.AM),))
    bank = ReceiverBank(cfg)
    specs = [synth.SignalSpec(offset_hz=100e3, mode="am", audio_hz=1000.0)]
    run_bank(bank, specs, 1)
    n = bank._step._cache_size()
    for m in (Mode.NFM, Mode.USB, Mode.CW, Mode.IQ):
        bank.set_mode(0, m)
        run_bank(bank, specs, 1)
    assert bank._step._cache_size() == n
