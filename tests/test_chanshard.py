"""Sharded channelizer == local channelizer, on an 8-virtual-device mesh."""

import numpy as np
import jax

from pysdr_tpu.models.channelizer_bank import (ChannelizerBank,
                                               ChannelizerBankConfig,
                                               ChannelSettings)
from pysdr_tpu.parallel import chanshard
from pysdr_tpu.parallel.mesh import single_axis_mesh
from pysdr_tpu.tables import Mode


def _make(n_channels, out_block=1024):
    cfg = ChannelizerBankConfig(
        fs_in=n_channels * 48e3, n_channels=n_channels, fs_out=48e3,
        out_block=out_block, fc_hz=100e6,
        channels=tuple(ChannelSettings(mode=Mode.AM, agc_enabled=False)
                       for _ in range(n_channels)))
    return ChannelizerBank(cfg)


def _synth(cb, n_blocks, chans=(1, 3, 6)):
    offs = np.fft.fftfreq(cb.n_ch, 1.0 / cb.cfg.fs_in)
    n = cb.in_block * n_blocks
    t = np.arange(n) / cb.cfg.fs_in
    x = np.zeros(n, np.complex64)
    for i, c in enumerate(chans):
        m = 0.5 * np.sin(2 * np.pi * 300.0 * (i + 1) * t)
        x = x + (1 + m) * np.exp(2j * np.pi * offs[c] * t)
    return x.astype(np.complex64)


def test_sharded_matches_local_8ch():
    mesh = single_axis_mesh("ch")
    cb = _make(8)
    x = _synth(cb, 3)
    a_shard = chanshard.run_sharded(cb, x, mesh, n_blocks=3)

    cb2 = _make(8)
    outs = [cb2.step(b) for b in np.split(x, 3)]
    a_local = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(a_shard, a_local, atol=2e-4)


def test_sharded_64ch_over_8_devices():
    """64 channels, 8 per device — the BASELINE config-5 shape."""
    mesh = single_axis_mesh("ch")
    cb = _make(64, out_block=512)
    x = _synth(cb, 2, chans=(2, 17, 40, 63))
    a = chanshard.run_sharded(cb, x, mesh, n_blocks=2)
    assert a.shape == (64, 1024)
    act = np.mean(np.abs(a[17, 512:]))
    idle = np.mean(np.abs(a[30, 512:]))
    assert act > 10 * idle


def test_stream_by_ch_2d_mesh_matches_serial():
    """2-D stream x ch channelizer: overlap-discard stream halo + channel
    sharding together reproduce serial block processing outside the first
    warm-up region."""
    from pysdr_tpu.parallel.mesh import make_mesh
    from pysdr_tpu.ops import cplx
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_stream=2, n_ch=4)
    cb = _make(8, out_block=512)
    unit = cb.n_ch * cb.plan.down
    seg = 65536
    halo = 24576      # covers AF warm-up + DC-blocker settling (~5 tau)
    assert seg % unit == 0 and halo % unit == 0
    n_need = 2 * seg // cb.in_block
    x = _synth(cb, n_need, chans=(1, 5))[: 2 * seg]

    proc, halo = chanshard.make_channelizer_stream_processor(
        cb, mesh, seg, halo=halo)
    _, specs = chanshard.make_channelizer_processor(cb, mesh)
    _, params, w_re, w_im = chanshard.shard_inputs(cb, mesh, specs)
    xp = jax.device_put(cplx.pack(x), NamedSharding(mesh, P("stream")))
    audio = np.asarray(proc(xp, params, w_re, w_im))
    a2d = audio[..., 0] + 1j * audio[..., 1]        # (8, 2*aseg)

    cb2 = _make(8, out_block=512)
    a_serial = np.concatenate(
        [cb2.step(b) for b in np.split(x, 2 * seg // cb2.in_block)],
        axis=-1)
    aseg = seg * cb.plan.up // (cb.plan.down * cb.n_ch)
    ahalo = halo * cb.plan.up // (cb.plan.down * cb.n_ch)
    # compare the second shard's segment (fully warmed by its halo) and
    # the tail of the first (past its zero-state warm-up)
    for c in (1, 5):
        ref = a_serial[c]
        got = a2d[c]
        skip = ahalo + 512
        seg1 = slice(skip, aseg)
        err1 = np.abs(got[seg1] - ref[seg1]).max()
        seg2 = slice(aseg + 16, 2 * aseg)
        err2 = np.abs(got[seg2] - ref[seg2]).max()
        scale = np.abs(ref).max() + 1e-9
        assert err1 / scale < 0.05, (c, err1 / scale)
        assert err2 / scale < 0.05, (c, err2 / scale)
