"""State-continuous sharded streaming == serial, across REPEATED calls.

VERDICT r2 #3: the one-shot sharded processors re-derive state per call
(halo-approximate every block); the streaming forms
(parallel/stream.make_streaming_processor, parallel/chanshard
.make_channelizer_streaming_processor, the executive-facing adapters in
parallel/adapter.py) carry the RF tail + NCO/BFO phase bases across
calls. These tests drive >= 4 consecutive super-blocks and require the
audio to match the serial bank everywhere after the initial settle —
including across every super-block boundary, which the one-shot form
fails (each call restarts cold at shard 0).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pysdr_tpu.config import PipelineConfig, ReceiverConfig
from pysdr_tpu.io import synth
from pysdr_tpu.models.channelizer_bank import (ChannelizerBank,
                                               ChannelizerBankConfig,
                                               ChannelSettings)
from pysdr_tpu.models.receiver import ReceiverBank
from pysdr_tpu.ops import cplx
from pysdr_tpu.parallel import mesh as mesh_mod
from pysdr_tpu.parallel.adapter import (ShardedChannelizerBank,
                                        ShardedStreamBank)
from pysdr_tpu.tables import Mode

FS = 512e3
FC0 = 10e6


def make_bank(n_ch=1, out_block=1024, mode=Mode.AM):
    rxs = tuple(
        ReceiverConfig(fc_hz=FC0 + 40e3 * i, mode=mode, agc_enabled=False)
        for i in range(n_ch))
    cfg = PipelineConfig(fs_in=FS, fs_out=48e3, out_block=out_block,
                         foffset_hz=60e3, receivers=rxs)
    return ReceiverBank(cfg)


def serial_audio(bank, x):
    blocks = np.split(np.asarray(x), len(x) // bank.design.in_block)
    outs = [np.asarray(bank.step(jnp.asarray(b))) for b in blocks]
    return np.concatenate(outs, axis=1)


def sharded_audio(adapter, x):
    ib = adapter.design.in_block
    outs = []
    for b in np.split(np.asarray(x), len(x) // ib):
        a = np.asarray(adapter.step_device(
            jnp.asarray(cplx.pack(b.astype(np.complex64)))))
        outs.append(cplx.unpack(a.reshape(adapter.n_rx, -1, 2)))
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("n_stream,n_ch_mesh", [(2, 1), (4, 1), (2, 2)])
def test_streaming_sharded_matches_serial_multiblock(n_stream, n_ch_mesh):
    n_rx = max(n_ch_mesh, 2)
    bank_s = make_bank(n_ch=n_rx, out_block=9600)
    bank_p = make_bank(n_ch=n_rx, out_block=9600)
    d = bank_s.design
    n_calls = 4
    n = d.in_block * n_stream * n_calls
    offs = bank_s.cfg.channel_offsets_hz()
    specs = [synth.SignalSpec(offset_hz=o, mode="am",
                              audio_hz=500.0 + 200 * i)
             for i, o in enumerate(offs)]
    x = synth.render(specs, FS, n, noise_rms=0.01)
    a_serial = serial_audio(bank_s, x)

    m = mesh_mod.make_mesh(n_stream=n_stream, n_ch=n_ch_mesh)
    adapter = ShardedStreamBank(bank_p, m)
    a_par = sharded_audio(adapter, x)

    assert a_par.shape == a_serial.shape
    # everything after the initial settle must match — especially across
    # the super-block boundaries at k * in_block * n_stream
    skip = 16384
    for c in range(n_rx):
        err = np.max(np.abs(a_par[c, skip:] - a_serial[c, skip:]))
        scale = np.std(a_serial[c, skip:]) + 1e-9
        assert err / scale < 0.02, (c, err / scale)


def test_streaming_sharded_control_change_applies_next_superblock():
    """A block-boundary params change (the executive's command queue
    semantics) must land at super-block k in the sharded path exactly as
    at serial block k*S."""
    n_stream = 2
    bank_s = make_bank(n_ch=1, out_block=9600)
    bank_p = make_bank(n_ch=1, out_block=9600)
    d = bank_s.design
    n_calls = 4
    n = d.in_block * n_stream * n_calls
    specs = [synth.SignalSpec(offset_hz=60e3, mode="am", audio_hz=700.0)]
    x = synth.render(specs, FS, n, noise_rms=0.0)

    blocks = np.split(np.asarray(x), n_calls * n_stream)
    outs = []
    for i, b in enumerate(blocks):
        if i == 2 * n_stream:           # boundary of super-block 2
            bank_s.set_af_gain(0, 2.0)
        outs.append(np.asarray(bank_s.step(jnp.asarray(b))))
    a_serial = np.concatenate(outs, axis=1)[0]

    m = mesh_mod.make_mesh(n_stream=n_stream, n_ch=1)
    adapter = ShardedStreamBank(bank_p, m)
    super_blocks = np.split(np.asarray(x), n_calls)
    outs = []
    for i, b in enumerate(super_blocks):
        if i == 2:
            adapter.set_af_gain(0, 2.0)   # delegated to the inner bank
        a = np.asarray(adapter.step_device(
            jnp.asarray(cplx.pack(b.astype(np.complex64)))))
        outs.append(cplx.unpack(a.reshape(1, -1, 2)))
    a_par = np.concatenate(outs, axis=1)[0]

    skip = 16384
    err = np.max(np.abs(a_par[skip:] - a_serial[skip:]))
    assert err / (np.std(a_serial[skip:]) + 1e-9) < 0.02
    # and the gain change actually took effect
    mid = len(a_par) // 2
    assert np.std(a_par[mid + 4096:]) > 1.5 * np.std(a_par[skip:mid - 4096])


def test_streaming_sharded_channelizer_multiblock():
    n = 8
    fs_in = n * 96e3
    cfg = ChannelizerBankConfig(
        fs_in=fs_in, n_channels=n, fs_out=48e3, out_block=9600,
        fc_hz=100e6,
        channels=tuple(ChannelSettings(mode=Mode.AM, agc_enabled=False)
                       for _ in range(n)))
    cb_s, cb_p = ChannelizerBank(cfg), ChannelizerBank(cfg)
    offs = cfg.center_freqs_hz() - cfg.fc_hz
    specs = [synth.SignalSpec(offset_hz=offs[i], mode="am", amplitude=0.4,
                              audio_hz=300.0 + 100.0 * i)
             for i in range(0, n, 2)]
    n_calls, n_stream = 4, 2
    total = cb_s.in_block * n_stream * n_calls
    x = synth.render(specs, fs_in, total, noise_rms=0.0)

    outs = []
    for b in np.split(np.asarray(x), n_stream * n_calls):
        outs.append(cb_s.step(b))
    a_serial = np.concatenate(outs, axis=1)

    m = mesh_mod.make_mesh(n_stream=n_stream, n_ch=4)
    adapter = ShardedChannelizerBank(cb_p, m)
    a_par = sharded_audio(adapter, x)

    assert a_par.shape == a_serial.shape
    skip = 16384
    for c in range(0, n, 2):
        err = np.max(np.abs(a_par[c, skip:] - a_serial[c, skip:]))
        scale = np.std(a_serial[c, skip:]) + 1e-9
        assert err / scale < 0.03, (c, err / scale)


def test_streaming_sharded_i16_wire():
    """The int wire formats ride the sharded path: dequant happens on
    device before the halo exchange, so sharded-i16 matches sharded-f32
    within the quantization floor."""
    bank_a = make_bank(n_ch=2, out_block=9600)
    bank_b = make_bank(n_ch=2, out_block=9600)
    d = bank_a.design
    n = d.in_block * 2 * 2
    offs = bank_a.cfg.channel_offsets_hz()
    # two stations sum on the wire: keep the COMBINED peak inside ADC
    # full scale |x| <= 1.0 or the int wire clips (by design)
    specs = [synth.SignalSpec(offset_hz=o, mode="am", amplitude=0.3,
                              audio_hz=500.0 + 200 * i)
             for i, o in enumerate(offs)]
    x = synth.render(specs, FS, n, noise_rms=0.001)
    m = mesh_mod.make_mesh(n_stream=2, n_ch=1)
    ad_f = ShardedStreamBank(bank_a, m)
    ad_q = ShardedStreamBank(bank_b, m)
    a_f = sharded_audio(ad_f, x)
    ib = ad_q.design.in_block
    outs = []
    for b in np.split(np.asarray(x), len(x) // ib):
        q = cplx.quantize_host(cplx.pack(b.astype(np.complex64)), "i16")
        a = np.asarray(ad_q.step_device(jnp.asarray(q)))
        outs.append(cplx.unpack(a.reshape(ad_q.n_rx, -1, 2)))
    a_q = np.concatenate(outs, axis=1)
    skip = 16384
    for c in range(2):
        ref, tst = a_f[c, skip:].real, a_q[c, skip:].real
        err = ref - tst
        snr = 10 * np.log10(float(ref @ ref)
                            / max(float(err @ err), 1e-30))
        assert snr > 55.0, (c, snr)


@pytest.mark.parametrize("squelch_db", [-150.0, -60.0])
def test_streaming_sharded_agc_on_snr(squelch_db):
    """VERDICT r3 #3: the one approximation stream sharding makes is the
    slow recurrences (AGC tau ~1 s > any affordable halo). With the
    demod recurrence state now carried across calls from the last shard,
    sharded-vs-serial with AGC ENGAGED (and, second param, squelch
    engaged with the gate open on signal) must hold a fit-SNR bound
    across >= 4 super-blocks."""
    n_stream = 2

    def mk():
        rxs = (ReceiverConfig(fc_hz=FC0, mode=Mode.AM, agc_enabled=True,
                              squelch_db=squelch_db),)
        cfg = PipelineConfig(fs_in=FS, fs_out=48e3, out_block=9600,
                             foffset_hz=60e3, receivers=rxs)
        return ReceiverBank(cfg)

    bank_s, bank_p = mk(), mk()
    d = bank_s.design
    n_calls = 4
    n = d.in_block * n_stream * n_calls
    specs = [synth.SignalSpec(offset_hz=60e3, mode="am", audio_hz=600.0)]
    x = synth.render(specs, FS, n, noise_rms=0.005)
    a_serial = serial_audio(bank_s, x)

    m = mesh_mod.make_mesh(n_stream=n_stream, n_ch=1)
    adapter = ShardedStreamBank(bank_p, m)
    a_par = sharded_audio(adapter, x)

    skip = 48000            # 1 s: let the serial AGC attack finish
    ref = a_serial[0, skip:].real
    tst = a_par[0, skip:].real
    err = ref - tst
    snr = 10 * np.log10(float(ref @ ref) / max(float(err @ err), 1e-30))
    assert snr > 30.0, snr


def test_streaming_sharded_squelch_gate_tracks_serial():
    """Squelch CLOSING mid-stream on the sharded path: the signal drops
    at half time; both paths must mute the tail (the gate latch is
    carried state — memories a halo cannot re-derive)."""
    n_stream = 2

    def mk():
        rxs = (ReceiverConfig(fc_hz=FC0, mode=Mode.NFM, agc_enabled=True,
                              squelch_db=6.0),)
        cfg = PipelineConfig(fs_in=FS, fs_out=48e3, out_block=9600,
                             foffset_hz=60e3, receivers=rxs)
        return ReceiverBank(cfg)

    bank_s, bank_p = mk(), mk()
    d = bank_s.design
    n_calls = 4
    n = d.in_block * n_stream * n_calls
    specs = [synth.SignalSpec(offset_hz=60e3, mode="fm", audio_hz=700.0)]
    x = np.asarray(synth.render(specs, FS, n, noise_rms=0.003))
    x[n // 2:] = (0.003 * (np.random.default_rng(3).standard_normal(
        n - n // 2) + 1j * np.random.default_rng(4).standard_normal(
        n - n // 2))).astype(np.complex64)     # carrier drops
    a_serial = serial_audio(bank_s, x)

    m = mesh_mod.make_mesh(n_stream=n_stream, n_ch=1)
    adapter = ShardedStreamBank(bank_p, m)
    a_par = sharded_audio(adapter, x)

    n_out = a_serial.shape[1]
    open_s = np.std(a_serial[0, n_out // 4:n_out // 2 - 4800].real)
    open_p = np.std(a_par[0, n_out // 4:n_out // 2 - 4800].real)
    tail_s = np.std(a_serial[0, -n_out // 4:].real)
    tail_p = np.std(a_par[0, -n_out // 4:].real)
    # both gates were open on signal and closed after the drop
    assert open_s > 10 * max(tail_s, 1e-9)
    assert open_p > 10 * max(tail_p, 1e-9)


def test_streaming_sharded_audio_wire_i8():
    """The i8 (mu-law) audio return rides the sharded path: quantization
    happens inside each shard, host dequant via the LUT."""
    bank_f = make_bank(n_ch=1, out_block=9600)
    rxs = (ReceiverConfig(fc_hz=FC0, mode=Mode.AM, agc_enabled=False),)
    cfg = PipelineConfig(fs_in=FS, fs_out=48e3, out_block=9600,
                         foffset_hz=60e3, receivers=rxs)
    bank_q = ReceiverBank(cfg, audio_wire="i8")
    d = bank_f.design
    n = d.in_block * 2 * 2
    specs = [synth.SignalSpec(offset_hz=60e3, mode="am", audio_hz=500.0)]
    x = synth.render(specs, FS, n, noise_rms=0.001)
    m = mesh_mod.make_mesh(n_stream=2, n_ch=1)
    a_f = sharded_audio(ShardedStreamBank(bank_f, m), x)
    ad_q = ShardedStreamBank(bank_q, m)
    outs = []
    for b in np.split(np.asarray(x), len(x) // ad_q.design.in_block):
        q = np.asarray(ad_q.step_device(
            jnp.asarray(cplx.pack(b.astype(np.complex64)))))
        assert q.dtype == np.int8
        outs.append(cplx.unpack(cplx.dequantize_audio_host(q)
                                .reshape(1, -1, 2)))
    a_q = np.concatenate(outs, axis=1)
    skip = 16384
    ref, tst = a_f[0, skip:].real, a_q[0, skip:].real
    err = ref - tst
    snr = 10 * np.log10(float(ref @ ref) / max(float(err @ err), 1e-30))
    assert snr > 30.0, snr


def test_adapter_setattr_forwards_to_bank():
    """Round-4 fix: the facade's write-through — assigning an attribute
    the wrapped bank owns (on_device_retune) must reach the bank, while
    adapter-owned state stays on the adapter."""
    bank = make_bank(n_ch=2, out_block=9600)
    m = mesh_mod.make_mesh(n_stream=2, n_ch=1)
    ad = ShardedStreamBank(bank, m)
    cb = lambda c: None  # noqa: E731
    ad.on_device_retune = cb
    assert bank.on_device_retune is cb
    assert "on_device_retune" not in ad.__dict__
    ad._last_bb = "mine"                    # adapter-owned
    assert ad.__dict__["_last_bb"] == "mine"
    assert getattr(bank, "_last_bb", None) != "mine"


def test_adapter_rejects_indivisible_ch_axis():
    import pytest as _pytest
    bank = make_bank(n_ch=3, out_block=9600)
    m = mesh_mod.make_mesh(n_stream=2, n_ch=2)
    with _pytest.raises(ValueError, match="must divide"):
        ShardedStreamBank(bank, m)
