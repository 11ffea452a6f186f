"""Fused Pallas mix+decimate vs the unfused pure-JAX path.

Run in interpreter mode on CPU (conftest forces the cpu backend); the same
kernel compiles natively on TPU where the bench exercises it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pysdr_tpu.ops import cplx, fir, nco, resample
from pysdr_tpu.ops.pallas import mixdec


def _reference(x, hist_raw, k, p0, h, up, down):
    """Unfused: remix raw tail at the back-shifted phase, then the framed
    polyphase matmul of ops/resample."""
    kp1 = hist_raw.shape[0]
    p0m = nco.advance((nco.DENOM - k) % nco.DENOM, jnp.int32(p0), kp1)
    xp = jnp.concatenate([jnp.asarray(hist_raw), jnp.asarray(x)])
    y, _ = nco.mix_down(xp, jnp.int32(k), p0m)
    w = jnp.asarray(resample.pack_weights(h, up, down))
    bb, _ = resample.resample_block(y[kp1:], y[:kp1], w, up=up, down=down)
    return np.asarray(bb)


@pytest.mark.parametrize("up,down,ntaps_pp", [
    (3, 128, 40),     # 2.048 MHz -> 48 kHz (graft-entry plan)
    (3, 500, 24),     # 8 MHz -> 48 kHz (bench plan)
    (1, 64, 33),      # plain decimator, odd tap count per phase
])
def test_matches_unfused(rng, up, down, ntaps_pp):
    n = 8 * down * 16                      # a few kernel tiles incl. padding
    n_ch = 3
    ntaps = up * ntaps_pp
    kp1 = resample.history_len(ntaps, up)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    hist = (rng.standard_normal(kp1) + 1j * rng.standard_normal(kp1)
            ).astype(np.complex64)
    fs = 48e3 * down / up
    hs = [np.asarray(fir.lowpass(ntaps, 0.5 * 48e3 / (1 + i), fs),
                     np.float32) for i in range(n_ch)]
    ks = np.array([nco.snap_freq(f, fs) for f in (11e3, -37e3, 0.0)],
                  np.int32)
    p0s = np.array([0, 12345, nco.DENOM - 7], np.int32)

    w_sel = jnp.asarray(np.stack(
        [mixdec.pack_weights_pallas(h, up, down) for h in hs]))
    bb_p = mixdec.mix_decimate(
        jnp.asarray(cplx.pack(x)), jnp.asarray(cplx.pack(hist)),
        jnp.asarray(ks), jnp.asarray(p0s), w_sel,
        up=up, down=down, interpret=True, tm=32)
    got = cplx.unpack(np.asarray(bb_p))

    for c in range(n_ch):
        want = _reference(x, hist, int(ks[c]), int(p0s[c]), hs[c], up, down)
        assert got[c].shape == want.shape
        scale = max(np.abs(want).max(), 1e-9)
        np.testing.assert_allclose(got[c] / scale, want / scale,
                                   atol=2e-5, rtol=0)


def test_zero_history_start(rng):
    """First block: zero raw history must equal resample from zero hist."""
    up, down, ntaps = 3, 32, 96
    kp1 = resample.history_len(ntaps, up)
    n = 32 * down
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    h = np.asarray(fir.lowpass(ntaps, 12e3, 48e3 * down / up), np.float32)
    k = nco.snap_freq(5e3, 48e3 * down / up)
    w_sel = jnp.asarray(mixdec.pack_weights_pallas(h, up, down)[None])
    bb_p = mixdec.mix_decimate(
        jnp.asarray(cplx.pack(x)),
        jnp.zeros((kp1, 2), jnp.float32),
        jnp.asarray([k], jnp.int32), jnp.asarray([0], jnp.int32), w_sel,
        up=up, down=down, interpret=True, tm=32)
    got = cplx.unpack(np.asarray(bb_p))[0]
    want = _reference(x, np.zeros(kp1, np.complex64), k, 0, h, up, down)
    scale = max(np.abs(want).max(), 1e-9)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5, rtol=0)


def test_streaming_equals_batch(rng):
    """Two chunks with raw-tail carry == one big block (state-carry pattern,
    reference sigs/iir.py:83-105)."""
    up, down, ntaps = 1, 16, 64
    kp1 = resample.history_len(ntaps, up)
    n = 64 * down
    x = (rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n)
         ).astype(np.complex64)
    fs = 48e3 * down / up
    h = np.asarray(fir.lowpass(ntaps, 10e3, fs), np.float32)
    k = nco.snap_freq(-3e3, fs)
    w_sel = jnp.asarray(mixdec.pack_weights_pallas(h, up, down)[None])
    ks = jnp.asarray([k], jnp.int32)

    def run(xb, hist, p0):
        return cplx.unpack(np.asarray(mixdec.mix_decimate(
            jnp.asarray(cplx.pack(xb)), jnp.asarray(cplx.pack(hist)),
            ks, jnp.asarray([p0], jnp.int32), w_sel,
            up=up, down=down, interpret=True, tm=16)))[0]

    full = run(x, np.zeros(kp1, np.complex64), 0)
    a = run(x[:n], np.zeros(kp1, np.complex64), 0)
    p1 = int(np.asarray(nco.advance(k, 0, n)))
    b = run(x[n:], x[n - kp1:n], p1)
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=3e-5)
