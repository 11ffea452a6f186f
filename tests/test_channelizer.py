import numpy as np
import jax.numpy as jnp

from pysdr_tpu.ops import channelizer


def test_tone_lands_in_correct_channel():
    fs, nch = 2.048e6, 64
    d = channelizer.ChannelizerDesign(fs_in=fs, n_channels=nch)
    w = jnp.asarray(channelizer.pack_branch_weights(d.prototype(), nch))
    hist = jnp.zeros(channelizer.history_len(d), jnp.complex64)
    centers = d.center_freqs_hz()
    c_target = 5
    n = nch * 2048
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * centers[c_target] * t).astype(np.complex64)
    y, _ = channelizer.channelize_block(jnp.asarray(x), hist, w,
                                        n_channels=nch)
    y = np.asarray(y)[64:]  # skip filter transient
    power = np.mean(np.abs(y) ** 2, axis=0)
    assert np.argmax(power) == c_target
    # near-unit gain in the target channel, strong rejection elsewhere
    assert abs(power[c_target] - 1.0) < 0.05
    others = np.delete(power, c_target)
    assert 10 * np.log10(power[c_target] / others.max()) > 50


def test_negative_freq_channel():
    fs, nch = 1.024e6, 32
    d = channelizer.ChannelizerDesign(fs_in=fs, n_channels=nch)
    w = jnp.asarray(channelizer.pack_branch_weights(d.prototype(), nch))
    hist = jnp.zeros(channelizer.history_len(d), jnp.complex64)
    centers = d.center_freqs_hz()
    c_target = 20   # a negative-frequency channel in fftfreq order
    assert centers[c_target] < 0
    n = nch * 1024
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * centers[c_target] * t).astype(np.complex64)
    y, _ = channelizer.channelize_block(jnp.asarray(x), hist, w,
                                        n_channels=nch)
    power = np.mean(np.abs(np.asarray(y)[32:]) ** 2, axis=0)
    assert np.argmax(power) == c_target


def test_streaming_equals_batch(rng):
    fs, nch = 256e3, 16
    d = channelizer.ChannelizerDesign(fs_in=fs, n_channels=nch,
                                      taps_per_branch=8)
    w = jnp.asarray(channelizer.pack_branch_weights(d.prototype(), nch))
    n = nch * 512
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    hist = jnp.zeros(channelizer.history_len(d), jnp.complex64)
    y_full, _ = channelizer.channelize_block(jnp.asarray(x), hist, w,
                                             n_channels=nch)
    hist = jnp.zeros_like(hist)
    parts = []
    for i in range(0, n, n // 4):
        y, hist = channelizer.channelize_block(
            jnp.asarray(x[i:i + n // 4]), hist, w, n_channels=nch)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts, axis=0),
                               np.asarray(y_full), atol=1e-4)


def test_offset_tone_mixes_down_inside_channel():
    # a tone 3 kHz off a channel center appears at +3 kHz in that channel
    fs, nch = 2.048e6, 64
    d = channelizer.ChannelizerDesign(fs_in=fs, n_channels=nch)
    w = jnp.asarray(channelizer.pack_branch_weights(d.prototype(), nch))
    hist = jnp.zeros(channelizer.history_len(d), jnp.complex64)
    centers = d.center_freqs_hz()
    c, off = 10, 3e3
    n = nch * 4096
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * (centers[c] + off) * t).astype(np.complex64)
    y, _ = channelizer.channelize_block(jnp.asarray(x), hist, w,
                                        n_channels=nch)
    ych = np.asarray(y)[256:, c]
    dphi = np.angle(ych[1:] * np.conj(ych[:-1]))
    f_est = np.mean(dphi) / (2 * np.pi) * d.fs_channel
    assert abs(f_est - off) < 20.0
