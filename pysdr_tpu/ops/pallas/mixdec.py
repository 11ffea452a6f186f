"""Fused NCO-mix + polyphase-decimate Pallas TPU kernel.

The hot DSP stage of every receiver chain — the reference's
`lo.quad_mixer(x)` followed by the decimating FIR (`rx.dec`, reference
receiver.py:553 and the external sig_proc engine) — fused into ONE kernel
so the full-rate RF block crosses HBM exactly once:

  * the pure-JAX path (ops/resample.py) materializes, per channel, the
    mixed signal AND an (m, L)-framed expansion of it in HBM
    (L/down ≈ 3-4x the input) before the polyphase dot;
  * this kernel streams (TM+QB, down)-shaped row tiles of the RAW input
    through VMEM once, synthesizes the LO on the VPU from the exact-int
    phase index (same integer arithmetic as ops/nco.py — results are
    bit-identical to the unfused path), mixes in registers, and reduces the
    polyphase taps straight out of VMEM with q small MXU contractions per
    tile. Per-channel HBM traffic on this stage drops from ~70 B/sample to
    ~0 (the tile is shared by every channel; only the audio-rate baseband
    is written back).

Layout: frame j of the polyphase resampler needs input samples
[j*down, j*down + L) with L = down + Kp - 1; a row-major (rows, down) view
of the input makes frame j = rows[j : j+q] with q = ceil(L/down), so a tile
of TM frames is rows[t*TM : t*TM + TM + q]. The grid walks t; the main
(TM, down) block and a (QB, down) tail block (QB = q rounded up to a
power of two dividing TM) arrive via two BlockSpecs over the same array —
no manual DMA, and Pallas double-buffers the stream automatically.

History/state: the caller passes the RAW last Kp-1 input samples of the
previous block (phase is analytic — ops/nco.py — so remixing the raw tail
with the back-shifted phase reproduces the previous block's mixed tail
exactly). Output y[j*up + u] matches ops/resample.resample_block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pysdr_tpu.ops import nco, resample

_TM = 128  # output frames per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def upad_of(up: int) -> int:
    return _round_up(up, 8)


def n_shifts(down: int, kp1: int) -> int:
    """q = ceil(L / down), L = down + kp1."""
    return -(-(down + kp1) // down)


def pack_weights_pallas(h: np.ndarray, up: int, down: int) -> np.ndarray:
    """Prototype FIR h (ntaps,) -> kernel weights (q, UPAD, down) float32.

    W[s, u, c] multiplies input row element (j+s, c) into output frame j,
    phase u — i.e. the (L, up) polyphase matrix of ops/resample.pack_weights
    zero-padded to q*down rows and UPAD phases, reshaped row-blockwise.
    """
    h = np.asarray(h, np.float32)
    kp1 = resample.history_len(h.shape[0], up)
    q = n_shifts(down, kp1)
    upad = upad_of(up)
    w2 = resample.pack_weights(h, up, down)[:, 0, :].T      # (L, up)
    L = w2.shape[0]
    wf = np.zeros((q * down, upad), np.float32)
    wf[:L, :up] = w2
    return np.ascontiguousarray(
        wf.reshape(q, down, upad).transpose(0, 2, 1))        # (q, UPAD, down)


def pack_weight_bank_pallas(bank: np.ndarray, up: int, down: int
                            ) -> np.ndarray:
    """Filter bank (n_bw, ntaps) -> (n_bw, q, UPAD, down)."""
    return np.stack([pack_weights_pallas(h, up, down) for h in bank])


def _mulmod(k, i):
    """(k * i) mod DENOM without int32 overflow.

    k: traced int32 scalar in [0, DENOM); i: int32 array < 2^24.
    Base-64 digit decomposition: every partial product < 2^28.
    """
    D = nco.DENOM
    acc = jnp.zeros_like(i)
    kj = k
    for j in range(4):                       # 4 digits cover i < 2^24
        dj = (i >> (6 * j)) & 63
        acc = acc + (kj * dj) % D
        kj = (kj * 64) % D
    return acc % D


def _make_kernel(n_ch: int, up: int, down: int, q: int, qb: int, tm: int):
    """Kernel over grid (T, n_ch): channel is a grid dim so every ref
    index is static (no dynamic ref indexing / in-kernel channel loop);
    the x tile's index map ignores the channel coordinate, so Pallas
    fetches it once per frame-tile and reuses it across channels."""
    upad = upad_of(up)
    two_pi_over_d = np.float32(2.0 * np.pi / nco.DENOM)

    def kernel(scal_ref, xr_m, xr_t, xi_m, xi_t, w_ref, outr, outi):
        t = pl.program_id(0)
        ch = pl.program_id(1)
        xr = jnp.concatenate([xr_m[:], xr_t[:]], axis=0)     # (TM+QB, down)
        xi = jnp.concatenate([xi_m[:], xi_t[:]], axis=0)
        rows = tm + qb
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, down), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, down), 1)
        i_ids = (t * tm + r_ids) * down + c_ids              # abs sample idx

        k = scal_ref[ch, 0]
        p0m = scal_ref[ch, 1]
        ph = (p0m + _mulmod(k, i_ids)) % nco.DENOM
        th = ph.astype(jnp.float32) * two_pi_over_d
        cs = jnp.cos(th)
        sn = jnp.sin(th)
        yr = xr * cs + xi * sn                               # x * e^{-j th}
        yi = xi * cs - xr * sn
        accr = jnp.zeros((upad, tm), jnp.float32)
        acci = jnp.zeros((upad, tm), jnp.float32)
        for s in range(q):
            ws = w_ref[0, s]                                 # (UPAD, down)
            dn = (((1,), (1,)), ((), ()))
            accr = accr + jax.lax.dot_general(
                ws, yr[s:s + tm], dn, preferred_element_type=jnp.float32)
            acci = acci + jax.lax.dot_general(
                ws, yi[s:s + tm], dn, preferred_element_type=jnp.float32)
        outr[0] = accr
        outi[0] = acci

    return kernel


@functools.partial(
    jax.jit, static_argnames=("up", "down", "interpret", "tm"))
def mix_decimate(x_p, hist_p, k, p0, w_sel, *, up: int, down: int,
                 interpret: bool = False, tm: int = _TM):
    """Fused mix+decimate over all channels of a bank.

    x_p    : float32 (n, 2) packed re/im RF block, n % down == 0, n < 2^24
    hist_p : float32 (kp1, 2) RAW tail of the previous block (zeros at start)
    k, p0  : int32 (n_ch,) NCO numerators / phase indices of x_p[0]
    w_sel  : float32 (n_ch, q, UPAD, down) from pack_weights_pallas
    returns: float32 (n_ch, m*up, 2) packed baseband at the audio rate

    Matches, bit-for-bit in the LO and to dot-accumulation order in the
    filter, ops/nco.mix_down + ops/resample.resample_block per channel.
    """
    n = x_p.shape[0]
    kp1 = hist_p.shape[0]
    n_ch, q, upad, _down = w_sel.shape
    assert _down == down and upad == upad_of(up)
    assert n % down == 0 and n + kp1 <= (1 << 24)
    assert q == n_shifts(down, kp1), (q, down, kp1)
    m = n // down
    m_pad = _round_up(m, tm)
    T = m_pad // tm
    qb = 8  # min sublane tile for f32 (Mosaic block divisibility rule)
    while qb < q:
        qb *= 2
    assert tm % qb == 0, (tm, qb)
    rows_total = m_pad + qb

    pad = rows_total * down - (n + kp1)
    z = jnp.zeros((pad, 2), jnp.float32)
    xp = jnp.concatenate([hist_p, x_p, z])                   # (rows*down, 2)
    xr = xp[:, 0].reshape(rows_total, down)
    xi = xp[:, 1].reshape(rows_total, down)

    # phase of xp[0] = phase of x[0] shifted back kp1 samples
    p0m = nco.advance((nco.DENOM - k) % nco.DENOM, p0, kp1)
    scal = jnp.stack([k.astype(jnp.int32), p0m.astype(jnp.int32)], axis=1)

    kern = _make_kernel(n_ch, up, down, q, qb, tm)
    grid_spec = pl.GridSpec(
        grid=(T, n_ch),   # channel minor: x tile reused across channels
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, down), lambda t, c: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, down), lambda t, c: ((t + 1) * tm // qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, down), lambda t, c: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, down), lambda t, c: ((t + 1) * tm // qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, upad, down), lambda t, c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, upad, tm), lambda t, c: (c, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, upad, tm), lambda t, c: (c, 0, t),
                         memory_space=pltpu.VMEM),
        ],
    )
    outr, outi = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_ch, upad, m_pad), jnp.float32)] * 2,
        interpret=interpret,
    )(scal, xr, xr, xi, xi, w_sel)

    bb_r = outr[:, :up, :m].transpose(0, 2, 1).reshape(n_ch, m * up)
    bb_i = outi[:, :up, :m].transpose(0, 2, 1).reshape(n_ch, m * up)
    return jnp.stack([bb_r, bb_i], axis=-1)
