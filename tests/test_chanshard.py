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
