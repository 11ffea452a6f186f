"""Channel-axis sharding for the ChannelizerBank.

The 64+-channel configuration (BASELINE config 5; generalization of the
reference's per-RX processes, am.py:85-114) shards over the 'ch' mesh axis
with ZERO collectives in the hot path:

  * the raw RF block is replicated — every device runs the (cheap, K
    multiplies/sample) branch filter on it;
  * the channel transform is a DFT-matrix matmul whose COLUMNS are sharded:
    each device multiplies the shared branch output (M, N) by only its own
    (N, C_local) DFT slice, producing exactly its channels' streams
    (ops/channelizer.dft_matrix rationale);
  * fine NCO / resampler / demod state and params are sharded on the
    leading channel axis and never leave the device.

The only cross-device traffic is the input broadcast itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pysdr_tpu.models.channelizer_bank import ChanBankState, ChannelizerBank
from pysdr_tpu.ops import channelizer as chan_ops
from pysdr_tpu.ops import cplx


def make_channelizer_processor(cb: ChannelizerBank, mesh: Mesh,
                               axis: str = "ch"):
    """Build a jitted sharded streaming step.

    Returns (process, state_specs) where
      process(state_p, x_p, params, w_re, w_im) -> (new_state_p, audio_p)
    with x_p float32 (in_block, 2) replicated, params/state sharded on the
    channel axis, audio_p float32 (n_ch, out_block, 2) sharded P(axis).
    Use `shard_inputs(cb, mesh)` to place state/params/W on the mesh.
    """
    n_sh = mesh.shape[axis]
    n = cb.n_ch
    assert n % n_sh == 0, (n, n_sh)

    def shard_fn(state_p, x_p, params, w_re_l, w_im_l):
        state = cplx.unpack_tree(state_p, cb._state_mask)
        x = cplx.unpack(x_p)
        v, chan_hist = chan_ops.branch_filter(
            x, state.chan_hist, cb.branch_weights, n)
        y = chan_ops.channel_transform(v, w_re_l, w_im_l)  # (M, C_local)
        audio, phase, rs_hist, dstate = jax.vmap(cb.channel_chain)(
            y.T, state.nco_phase, state.rs_hist, state.demod, params)
        new_state = ChanBankState(chan_hist=chan_hist, nco_phase=phase,
                                  rs_hist=rs_hist, demod=dstate)
        new_state_p, _ = cplx.pack_tree(new_state)
        return new_state_p, cplx.pack(audio)

    ch = P(axis)
    rep = P()
    state_specs = ChanBankState(
        chan_hist=rep,                        # replicated raw tail
        nco_phase=ch,
        rs_hist=ch,
        demod=jax.tree.map(lambda _: ch, cb.init_state().demod))
    param_specs = jax.tree.map(lambda _: ch, cb.params)
    in_specs = (state_specs, rep, param_specs, P(None, axis), P(None, axis))
    out_specs = (state_specs, ch)
    proc = jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))
    return proc, state_specs


def shard_inputs(cb: ChannelizerBank, mesh: Mesh, state_specs,
                 axis: str = "ch"):
    """Place the bank's packed state, params, and DFT factors on the mesh
    with the shardings the processor expects. Returns
    (state_p, params, w_re, w_im) device arrays."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    state_p = jax.tree.map(put, cb.state, state_specs)
    params = jax.tree.map(lambda x: put(x, P(axis)), cb.params)
    w_re = put(np.asarray(cb.w_re), P(None, axis))
    w_im = put(np.asarray(cb.w_im), P(None, axis))
    return state_p, params, w_re, w_im


def default_halo(cb: ChannelizerBank, settle_sec: float = 0.2) -> int:
    """Stream-axis halo in RF samples for the channelizer: covers the
    branch-filter history, the per-channel resampler history and AF
    warm-up mapped to the RF rate, plus recurrence settling; rounded to a
    multiple of N*down so channel/polyphase alignment is preserved."""
    n = cb.n_ch
    unit = n * cb.plan.down
    branch = chan_ops.history_len(cb.chan_design)
    af_rf = (cb.demod_design.af_taps + cb.demod_design.carrier_taps) \
        * cb.plan.down * n // cb.plan.up
    h = max(4 * branch, af_rf, int(settle_sec * cb.cfg.fs_in))
    return -(-h // unit) * unit


def make_channelizer_stream_processor(cb: ChannelizerBank, mesh: Mesh,
                                      seg: int, halo: int | None = None):
    """2-D stream x ch sharding of the channelizer: the IQ stream is cut
    into contiguous segments (one per 'stream' mesh row), each processed
    with an overlap-discard halo fetched from the left neighbor over
    `lax.ppermute` (same recipe as parallel/stream.py for the receiver
    bank); the channel axis shards the DFT columns + demod as in
    make_channelizer_processor. Fine NCO phases are analytic in the
    stream position, so no serial state crosses shards.

    Returns (process, halo) with
      process(x, params, w_re, w_im) -> audio
    x: float32 (S*seg, 2) packed, sharded P('stream'); audio: float32
    (n_ch, S*aseg, 2) sharded P('ch', 'stream').
    """
    n = cb.n_ch
    unit = n * cb.plan.down
    assert seg % unit == 0, (seg, unit)
    H = default_halo(cb) if halo is None else halo
    H = min(-(-H // unit) * unit, seg)
    n_stream = mesh.shape["stream"]
    aseg = seg * cb.plan.up // (cb.plan.down * n)
    ahalo = H * cb.plan.up // (cb.plan.down * n)
    from pysdr_tpu.ops import nco as nco_ops
    from pysdr_tpu.ops import demod as demod_ops_mod
    import jax.numpy as jnp

    def shard_fn(x_local, params, w_re_l, w_im_l):
        tail = x_local[-H:]
        perm = [(i, i + 1) for i in range(n_stream - 1)]
        left = jax.lax.ppermute(tail, "stream", perm)
        xe = cplx.unpack(jnp.concatenate([left, x_local]))   # (H+seg,)
        s = jax.lax.axis_index("stream")
        hist0 = jnp.zeros(chan_ops.history_len(cb.chan_design),
                          jnp.complex64)
        v, _ = chan_ops.branch_filter(xe, hist0, cb.branch_weights, n)
        y = chan_ops.channel_transform(v, w_re_l, w_im_l)    # (M, C_loc)

        def one(stream_col, pr):
            k = pr.nco_k
            # analytic fine-NCO phase at (s*seg - H)/N channel samples
            m_seg = seg // n
            m_h = H // n
            k_seg = nco_ops.advance(k, 0, m_seg)
            k_h = nco_ops.advance(k, 0, m_h)
            p0 = (nco_ops.advance(k_seg, 0, s) - k_h
                  + nco_ops.DENOM) % nco_ops.DENOM
            z, _ = nco_ops.mix_down(stream_col, k, p0)
            import jax.numpy as _jnp
            w = _jnp.asarray(cb.video_bank)[pr.video_row]
            from pysdr_tpu.ops import resample as rs
            kp1 = rs.history_len(
                cb.plan.up * cb.cfg.video_taps_per_phase, cb.plan.up)
            rh0 = _jnp.zeros(kp1, _jnp.complex64)
            bb, _ = rs.resample_block(z, rh0, w, up=cb.plan.up,
                                      down=cb.plan.down)
            dst = demod_ops_mod.init_state(cb.demod_design)
            bk = pr.demod.bfo_k
            bk_seg = nco_ops.advance(bk, 0, aseg)
            bk_h = nco_ops.advance(bk, 0, ahalo)
            dst = dst._replace(
                bfo_phase=(nco_ops.advance(bk_seg, 0, s) - bk_h
                           + nco_ops.DENOM) % nco_ops.DENOM)
            audio, _ = demod_ops_mod.demod_block(
                bb, dst, pr.demod, cb.demod_design,
                cb.carrier_taps, cb.pilot_taps)
            return cplx.pack(audio[ahalo:])       # drop warm-up

        return jax.vmap(one)(y.T, params)         # (C_loc, aseg, 2)

    param_specs = jax.tree.map(lambda _: P("ch"), cb.params)
    in_specs = (P("stream"), param_specs, P(None, "ch"), P(None, "ch"))
    out_specs = P("ch", "stream")
    proc = jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))
    return proc, H


def make_channelizer_streaming_processor(cb: ChannelizerBank, mesh: Mesh,
                                         seg: int,
                                         halo: int | None = None,
                                         audio_wire: str | None = None):
    """State-continuous repeated-call form of the 2-D stream x ch
    channelizer (the streaming analogue of
    make_channelizer_stream_processor — see parallel/stream.py
    make_streaming_processor for the carried-state rationale):
    shard 0's halo comes from the previous super-block's RF tail, and
    per-channel fine-NCO/BFO phase bases advance across calls.

    Carries the per-channel demod recurrence state (AGC envelope,
    squelch latch, mute hold — memories longer than any affordable halo)
    from the last stream shard across calls, and applies the audio wire
    (i16/i8 mu-law) inside each shard so the sharded path's return
    transport ships the small ints too (parallel/stream.py rationale).

    Returns (process, halo) with
      process(x, params, w_re, w_im, tail_prev, nco_base, bfo_base,
              dstate) -> (audio, new_nco_base, new_bfo_base, new_tail,
                          new_dstate)
    x: float32 (S*seg, 2) packed P('stream'); audio:
    (n_ch, S*aseg, 2) P('ch', 'stream') in the wire dtype; dstate:
    packed DemodState pytree with leading axis n_ch (seed with
    cb.state.demod).
    """
    import jax.numpy as jnp

    from pysdr_tpu.ops import demod as demod_ops_mod
    from pysdr_tpu.ops import nco as nco_ops
    from pysdr_tpu.ops import resample as rs

    n = cb.n_ch
    unit = n * cb.plan.down
    assert seg % unit == 0, (seg, unit)
    if "ch" in mesh.shape and n % mesh.shape["ch"]:
        raise ValueError(f"the mesh 'ch' axis ({mesh.shape['ch']}) must "
                         f"divide the channel count ({n})")
    want = default_halo(cb) if halo is None else halo
    H = min(-(-want // unit) * unit, seg)
    if H < want:
        import warnings
        warnings.warn(
            f"stream segment ({seg} samples, "
            f"{seg / cb.cfg.fs_in * 1e3:.0f} ms) is shorter than the "
            f"recurrence-settle halo ({want / cb.cfg.fs_in * 1e3:.0f} "
            "ms): state only partially re-settles per call — use a "
            "larger --block", stacklevel=3)
    n_stream = mesh.shape["stream"]
    aseg = seg * cb.plan.up // (cb.plan.down * n)
    ahalo = H * cb.plan.up // (cb.plan.down * n)
    m_seg, m_h = seg // n, H // n
    wire = cb.audio_wire if audio_wire is None else audio_wire
    _, dmask = cplx.pack_tree(demod_ops_mod.init_state(cb.demod_design))

    def shard_fn(x_local, params, w_re_l, w_im_l, tail_prev,
                 nco_base, bfo_base, dstate_p):
        # wire dequant precedes the halo exchange (parallel/stream.py)
        x_local = cplx.dequantize(x_local)
        tail = x_local[-H:]
        perm = [(i, i + 1) for i in range(n_stream - 1)]
        left = jax.lax.ppermute(tail, "stream", perm)
        s = jax.lax.axis_index("stream")
        left = jnp.where(s == 0, tail_prev, left)
        xe = cplx.unpack(jnp.concatenate([left, x_local]))
        hist0 = jnp.zeros(chan_ops.history_len(cb.chan_design),
                          jnp.complex64)
        v, _ = chan_ops.branch_filter(xe, hist0, cb.branch_weights, n)
        y = chan_ops.channel_transform(v, w_re_l, w_im_l)

        def one(stream_col, pr, nb, bb, dstp):
            k = pr.nco_k
            k_seg = nco_ops.advance(k, 0, m_seg)
            k_h = nco_ops.advance(k, 0, m_h)
            p0 = (nb + nco_ops.advance(k_seg, 0, s) - k_h
                  + nco_ops.DENOM) % nco_ops.DENOM
            z, _ = nco_ops.mix_down(stream_col, k, p0)
            w = jnp.asarray(cb.video_bank)[pr.video_row]
            kp1 = rs.history_len(
                cb.plan.up * cb.cfg.video_taps_per_phase, cb.plan.up)
            rh0 = jnp.zeros(kp1, jnp.complex64)
            bb_sig, _ = rs.resample_block(z, rh0, w, up=cb.plan.up,
                                          down=cb.plan.down)
            bk = pr.demod.bfo_k
            bk_seg = nco_ops.advance(bk, 0, aseg)
            bk_h = nco_ops.advance(bk, 0, ahalo)
            b0 = (bb + nco_ops.advance(bk_seg, 0, s) - bk_h
                  + nco_ops.DENOM) % nco_ops.DENOM
            dst = cplx.unpack_tree(dstp, dmask)._replace(bfo_phase=b0)
            audio, new_dst = demod_ops_mod.demod_block(
                bb_sig, dst, pr.demod, cb.demod_design,
                cb.carrier_taps, cb.pilot_taps)
            new_dp, _ = cplx.pack_tree(new_dst)
            return cplx.pack(audio[ahalo:]), new_dp

        audio, dnew = jax.vmap(one)(y.T, params, nco_base, bfo_base,
                                    dstate_p)
        return (cplx.quantize_audio_wire(audio, wire),
                jax.tree.map(lambda leaf: leaf[None], dnew))

    param_specs = jax.tree.map(lambda _: P("ch"), cb.params)
    dstate_spec = jax.tree.map(lambda _: P("ch"), dmask)
    in_specs = (P("stream"), param_specs, P(None, "ch"), P(None, "ch"),
                P(), P("ch"), P("ch"), dstate_spec)
    out_specs = (P("ch", "stream"),
                 jax.tree.map(lambda _: P("stream", "ch"), dmask))
    sharded = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)
    total_ch_in = n_stream * m_seg       # channel-rate samples per call
    total_out = n_stream * aseg

    def proc_impl(x, params, w_re, w_im, tail_prev, nco_base, bfo_base,
                  dstate):
        audio, state_all = sharded(x, params, w_re, w_im, tail_prev,
                                   nco_base, bfo_base, dstate)
        new_dstate = jax.tree.map(lambda leaf: leaf[-1], state_all)
        new_nb = nco_ops.advance(params.nco_k, nco_base, total_ch_in)
        new_bb = nco_ops.advance(params.demod.bfo_k, bfo_base, total_out)
        return (audio, new_nb, new_bb, cplx.dequantize(x[-H:]),
                new_dstate)

    return jax.jit(proc_impl), H


def run_sharded(cb: ChannelizerBank, x, mesh: Mesh, n_blocks: int = 1,
                axis: str = "ch"):
    """Convenience: process `n_blocks` consecutive blocks of host complex
    IQ through the sharded channelizer. Returns (n_ch, n_blocks*out_block)
    complex64 audio on the host."""
    proc, specs = make_channelizer_processor(cb, mesh, axis)
    state_p, params, w_re, w_im = shard_inputs(cb, mesh, specs, axis)
    outs = []
    for b in np.split(np.asarray(x), n_blocks):
        x_p = jax.device_put(cplx.pack(b.astype(np.complex64)),
                             NamedSharding(mesh, P()))
        state_p, audio_p = proc(state_p, x_p, params, w_re, w_im)
        outs.append(cplx.unpack(np.asarray(audio_p)))
    return np.concatenate(outs, axis=-1)
