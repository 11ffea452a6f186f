"""Stream-axis + channel-axis sharding vs serial processing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pysdr_tpu.config import PipelineConfig, ReceiverConfig
from pysdr_tpu.io import synth
from pysdr_tpu.models.receiver import ReceiverBank
from pysdr_tpu.parallel import mesh as mesh_mod
from pysdr_tpu.parallel import stream as stream_mod
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


@pytest.mark.parametrize("n_stream", [2, 4])
def test_stream_parallel_matches_serial(n_stream):
    bank = make_bank(n_ch=1, out_block=4096)
    d = bank.design
    n = d.in_block * 8
    specs = [synth.SignalSpec(offset_hz=60e3, mode="am", audio_hz=900.0)]
    x = synth.render(specs, FS, n, noise_rms=0.01)
    a_serial = serial_audio(bank, x)[0]

    m = mesh_mod.make_mesh(n_stream=n_stream, n_ch=1)
    a_par = np.asarray(stream_mod.process_stream(bank, jnp.asarray(x), m))[0]

    assert a_par.shape == a_serial.shape
    # identical except inside the very first halo (serial also starts cold)
    skip = 8192
    err = np.abs(a_par[skip:] - a_serial[skip:])
    scale = np.std(a_serial[skip:]) + 1e-9
    assert np.max(err) / scale < 0.02, np.max(err) / scale


def test_stream_and_channel_sharding():
    bank = make_bank(n_ch=4, out_block=4096)
    d = bank.design
    n = d.in_block * 8
    offs = bank.cfg.channel_offsets_hz()
    specs = [synth.SignalSpec(offset_hz=o, mode="am", audio_hz=500.0 + 200 * i)
             for i, o in enumerate(offs)]
    x = synth.render(specs, FS, n, noise_rms=0.0)
    a_serial = serial_audio(bank, x)

    m = mesh_mod.make_mesh(n_stream=2, n_ch=4)
    a_par = np.asarray(stream_mod.process_stream(bank, jnp.asarray(x), m))

    assert a_par.shape == a_serial.shape
    skip = 8192
    for c in range(4):
        err = np.max(np.abs(a_par[c, skip:] - a_serial[c, skip:]))
        scale = np.std(a_serial[c, skip:]) + 1e-9
        assert err / scale < 0.02, (c, err / scale)


def test_cw_bfo_phase_continuous_across_shards():
    # CW mode exercises the audio-rate analytic BFO phase
    bank = make_bank(n_ch=1, out_block=4096, mode=Mode.CW)
    d = bank.design
    n = d.in_block * 8
    specs = [synth.SignalSpec(offset_hz=60e3, mode="cw")]
    x = synth.render(specs, FS, n)
    a_serial = serial_audio(bank, x)[0]
    m = mesh_mod.make_mesh(n_stream=4, n_ch=1)
    a_par = np.asarray(stream_mod.process_stream(bank, jnp.asarray(x), m))[0]
    skip = 8192
    err = np.max(np.abs(a_par[skip:] - a_serial[skip:]))
    assert err / (np.std(a_serial[skip:]) + 1e-9) < 0.02
