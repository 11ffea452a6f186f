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
