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


def test_retune_actually_moves_the_nco():
    """Round-4 regression: _build_params used to derive NCO offsets from
    the construction-time cfg snapshot, making every retune a
    dial-display-only no-op (the DSP kept listening at the old
    frequency). A retune must move which STATION the audio carries."""
    import jax.numpy as jnp

    from pysdr_tpu.io import synth

    fs = 512e3
    cfg = PipelineConfig(
        fs_in=fs, fs_out=48e3, out_block=3072, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM,
                                          video_bw_hz=8e3,
                                          agc_enabled=False),))
    bank = ReceiverBank(cfg)
    k0 = int(np.asarray(bank.params.nco_k)[0])
    bank.retune(0, 10.04e6)
    k1 = int(np.asarray(bank.params.nco_k)[0])
    assert k1 != k0, "retune left the NCO numerator unchanged"

    # stations: 500 Hz AM at the original dial (+60k), 900 Hz at +100k
    x = synth.render(
        [synth.SignalSpec(offset_hz=60e3, mode="am", amplitude=0.35,
                          audio_hz=500.0),
         synth.SignalSpec(offset_hz=100e3, mode="am", amplitude=0.35,
                          audio_hz=900.0)], fs, 4 * 32768, noise_rms=0.001)

    def tone_of(bank):
        outs = []
        for b in np.split(np.asarray(x), len(x) // bank.design.in_block):
            outs.append(np.asarray(bank.step(jnp.asarray(b)))[0])
        a = np.concatenate(outs).real
        seg = a[len(a) // 2:]
        sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        return np.fft.rfftfreq(len(seg), 1 / 48e3)[5 + np.argmax(sp[5:])]

    assert abs(tone_of(bank) - 900.0) < 10.0       # retuned dial: +100k

    bank.retune(0, 10.0e6)                          # back to the original
    assert abs(tone_of(bank) - 500.0) < 10.0


def test_device_follow_retune_out_of_band():
    """Main-RX retune OUTSIDE the passband moves the device via
    on_device_retune and re-anchors every channel's offset (reference
    FreqSelect setFrequency(f2-FOFFSET), gui.py:1938-1944); without a
    capable source it warns about aliasing."""
    import warnings

    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=3072, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM),
                   ReceiverConfig(fc_hz=10.05e6, mode=Mode.AM)))
    bank = ReceiverBank(cfg)
    moves = []
    bank.on_device_retune = moves.append
    bank.retune(0, 14.1e6)               # way outside ±256 kHz
    assert moves == [14.1e6 - 60e3]      # new center = dial - foffset
    # RX0 sits at foffset again; RX1 offset re-anchored (now aliased
    # territory relative to the new center — it kept its absolute dial)
    from pysdr_tpu.ops import nco
    k0 = int(np.asarray(bank.params.nco_k)[0])
    assert k0 == nco.snap_freq(60e3, 512e3)
    # sub-RX out-of-band retune with no device authority: warns
    bank2 = ReceiverBank(cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bank2.retune(1, 20e6)
        assert any("alias" in str(x.message) for x in w)


def test_device_follow_end_to_end_synth():
    """Full chain: tuning the only RX to a station OUTSIDE the passband
    retunes the simulated front-end and the audio then carries that
    station's tone (the whole point of follow: the operator just types a
    far-away frequency)."""
    import jax.numpy as jnp

    from pysdr_tpu import app as app_mod

    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--fc", "0.6", "--block", "3072"])
    a = app_mod.App(args)
    # default synth: 400 Hz AM at the 0.6 MHz dial. Add a second station
    # 2 MHz away (outside the 512 kHz passband) at 900 Hz.
    from pysdr_tpu.io import synth
    import dataclasses as dc
    far_off = (2.6e6 - a.source.fc)      # absolute 2.6 MHz
    a.source.specs = a.source.specs + (dc.replace(
        a.source.specs[0], offset_hz=far_off, audio_hz=900.0),)
    a.ex.run(n_blocks=4)
    a.ex.post("retune", 0, 2.6e6)        # out-of-band -> device follows
    a.ex.run(n_blocks=12)
    ring = a.ex.audio_rings[0]
    audio = ring.pull(ring.nsamps).real
    seg = audio[-3 * 3072:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    pk = np.fft.rfftfreq(len(seg), 1 / 48e3)[5 + np.argmax(sp[5:])]
    assert abs(pk - 900.0) < 10.0, pk
    assert a.source.fc == 2.6e6 - 120e3  # center = dial - foffset


def test_runtime_bw_swaps_affect_audio():
    """Behavior-level guard for the filter-bank swap paths (the
    retune-no-op lesson: cfg assertions alone can hide a dead control
    path): a neighbor station leaking through the Max video filter must
    be rejected after a runtime set_video_bw, and further attenuated by
    a runtime set_af_bw."""
    fs = 512e3
    cfg = PipelineConfig(
        fs_in=fs, fs_out=48e3, out_block=3072, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM,
                                  agc_enabled=False),))
    bank = ReceiverBank(cfg)
    x = synth.render(
        [synth.SignalSpec(offset_hz=60e3, mode="am", amplitude=0.3,
                          audio_hz=400.0),
         synth.SignalSpec(offset_hz=80e3, mode="am", amplitude=0.3,
                          audio_hz=5000.0)], fs, 32768 * 4,
        noise_rms=0.001)

    def own_over_leak(bank):
        outs = [np.asarray(bank.step(jnp.asarray(b)))[0]
                for b in np.split(np.asarray(x), 4)]
        a = np.concatenate(outs).real
        seg = a[len(a) // 2:]
        sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = np.fft.rfftfreq(len(seg), 1 / 48e3)
        return (sp[np.argmin(abs(f - 400))]
                / sp[np.argmin(abs(f - 5000))])

    r_max = own_over_leak(bank)
    bank.set_video_bw(0, 8e3)
    r_video = own_over_leak(bank)
    assert r_video > 10 * r_max, (r_max, r_video)
    bank.set_af_bw(0, 2e3)
    r_af = own_over_leak(bank)
    assert r_af > 10 * r_video, (r_video, r_af)


def test_src_chained_rx_offsets():
    """RX chaining (reference -src, receiver.py:825-835): a chained
    RX's NCO offset derives from its SOURCE RX's dial, so it tracks the
    source's retunes at a fixed relative spacing."""
    from pysdr_tpu.ops import nco

    fs = 512e3
    cfg = PipelineConfig(
        fs_in=fs, fs_out=48e3, out_block=3072, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM),
                   ReceiverConfig(fc_hz=10.001e6, mode=Mode.CW, src=0)))
    bank = ReceiverBank(cfg)
    ks = np.asarray(bank.params.nco_k)
    assert int(ks[0]) == nco.snap_freq(60e3, fs)          # foffset path
    assert int(ks[1]) == nco.snap_freq(1e3, fs)           # fc1 - fc0
    # retuning the SOURCE keeps the chained spacing when the chained RX
    # follows (both dials updated, spacing intact)
    bank.retune(0, 10.05e6)
    bank.retune(1, 10.051e6)
    ks = np.asarray(bank.params.nco_k)
    assert int(ks[1]) == nco.snap_freq(1e3, fs)
    # CLI surface
    from pysdr_tpu import app as app_mod
    args = app_mod.build_parser().parse_args(
        ["--fc", "10.0", "10.001", "--modes", "AM", "CW",
         "--src", "-1", "0", "--fs", "0.512"])
    c = app_mod.build_config(args)
    assert c.receivers[1].src == 0 and c.receivers[0].src == -1


def test_random_control_sequence_equals_fresh_build():
    """Control-plane invariant (the retune-no-op bug class): after ANY
    sequence of block-boundary mutations, the bank's traced params must
    equal those of a bank built fresh from the resulting configs — the
    incremental path may never drift from the declarative one."""
    import dataclasses

    rng = np.random.default_rng(42)
    fs = 512e3
    cfg = PipelineConfig(
        fs_in=fs, fs_out=48e3, out_block=3072, foffset_hz=60e3,
        receivers=tuple(ReceiverConfig(fc_hz=10e6 + 30e3 * i)
                        for i in range(3)))
    bank = ReceiverBank(cfg)
    modes = [Mode.AM, Mode.NFM, Mode.USB, Mode.LSB, Mode.CW, Mode.IQ]
    ops = [
        lambda i: bank.retune(i, 10e6 + float(rng.uniform(-200e3, 200e3))),
        lambda i: bank.set_mode(i, modes[rng.integers(len(modes))]),
        lambda i: bank.set_video_bw(i, float(rng.choice([0, 8e3, 16e3]))),
        lambda i: bank.set_af_bw(i, float(rng.choice([0, 2e3, 3e3]))),
        lambda i: bank.set_af_gain(i, float(rng.uniform(0.1, 3.0))),
        lambda i: bank.set_squelch(i, float(rng.uniform(-150, 20))),
        lambda i: bank.set_agc(i, bool(rng.integers(2))),
        lambda i: bank.set_mute(i, bool(rng.integers(2))),
    ]
    for _ in range(40):
        ops[rng.integers(len(ops))](int(rng.integers(3)))

    fresh_cfg = dataclasses.replace(cfg,
                                    receivers=tuple(bank._rx_cfgs))
    fresh = ReceiverBank(fresh_cfg)
    # anchor must match too (no device-follow source here: retunes
    # beyond the passband warn but keep the anchor)
    fresh._center_dial = bank._center_dial
    fresh.params = fresh._build_params()

    import jax
    for a, b in zip(jax.tree.leaves(bank.params),
                    jax.tree.leaves(fresh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_step_matches_per_channel_reference_form():
    """The bank's fused step (ops/resample.mixed_resample_bank + vmapped
    demod) must match the documented per-channel reference form
    channel_step (mix_down -> resample_block -> demod) to float-rounding
    level — the fold is an exact regrouping on the integer phase grid.
    Guards the fused path at the MODEL level (params gather, phase
    back-shift, demod state threading), not just the op level."""
    import jax
    from pysdr_tpu.models import receiver as rx_mod
    from pysdr_tpu.ops import cplx

    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=3072, foffset_hz=60e3,
        receivers=(
            ReceiverConfig(fc_hz=10e6, mode=Mode.AM),
            ReceiverConfig(fc_hz=10.03e6, mode=Mode.NFM, squelch_db=-150),
            ReceiverConfig(fc_hz=9.97e6, mode=Mode.USB),
            ReceiverConfig(fc_hz=10.06e6, mode=Mode.CW),
        ))
    bank = ReceiverBank(cfg)
    rng = np.random.default_rng(7)
    d = bank.design
    specs = [synth.SignalSpec(offset_hz=60e3, mode="am", audio_hz=700.0)]
    src = synth.SynthSource(specs, fs=cfg.fs_in, noise_rms=0.05)

    def ref_step(state, x, params):
        st = cplx.unpack_tree(state, bank._state_mask)
        xc = cplx.unpack(x)

        def one(ch_st, pr):
            audio, new_st, _ = rx_mod.channel_step(
                xc, st.hist, ch_st, pr, d, bank.video_bank,
                bank.carrier_taps, bank.pilot_taps)
            return audio, new_st
        audio, new_ch = jax.vmap(one)(st.ch, params)
        kp1 = st.hist.shape[0]
        new = rx_mod.BankState(hist=xc[-kp1:] if kp1 else st.hist,
                               ch=new_ch)
        return cplx.pack_tree(new)[0], audio

    state_ref = bank.state
    for blk in range(3):
        x = bank.to_device_block(jnp.asarray(
            src.read_data(d.in_block)))
        state_ref, audio_ref = ref_step(state_ref, x, bank.params)
        state_new, (audio_new_p, _) = bank.step_functional(
            bank.state, x, bank.params)
        bank.state = state_new
        a_new = cplx.unpack(np.asarray(audio_new_p).reshape(
            bank.n_rx, d.out_block, 2))
        a_ref = np.asarray(audio_ref)
        err = (np.abs(a_new - a_ref) ** 2).mean()
        sig = max((np.abs(a_ref) ** 2).mean(), 1e-30)
        snr_db = -10 * np.log10(max(err / sig, 1e-30))
        assert snr_db > 80, (blk, snr_db)
