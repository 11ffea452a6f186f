"""Executive-compatible adapters that run a bank across a device mesh.

The streaming executive (runtime/executive.py) drives any bank through a
small facade: `design.{fs_in,fs_out,in_block,out_block}`, `n_rx`,
`step_device(x_p) -> packed audio`, and the block-boundary control
methods. These adapters present that facade over the STATE-CONTINUOUS
sharded processors (parallel/stream.py make_streaming_processor,
parallel/chanshard.py make_channelizer_streaming_processor), so the CLI
(`--mesh S,C`, app.py) processes a replay across real devices with audio
that matches the serial path block after block:

  * each executive block is one SUPER-block of S segments, one per
    'stream' mesh row (in_block = S x the serial block);
  * FIR/resampler state crosses calls exactly (the previous super-block's
    RF tail feeds shard 0's halo); NCO/BFO phases are continuous via
    carried per-channel bases; exponential recurrences (AGC/DC/squelch)
    re-settle inside each shard's halo — the documented approximation of
    stream parallelism (SURVEY §2.10 row 4);
  * control methods delegate to the wrapped bank: the processors read
    `bank.params` every call, so retune/mode/gain changes posted through
    the executive's command queue apply at the next super-block exactly
    like the serial path.

This is the product-facing face of SURVEY §2.10 rows 1/4 (channel and
time-block parallelism): the same binary, pointed at a mesh.
"""

from __future__ import annotations

import types

import jax
import numpy as np
from jax.sharding import Mesh

from pysdr_tpu.parallel import chanshard as chanshard_mod
from pysdr_tpu.parallel import stream as stream_mod


def build_mesh(n_stream: int, n_ch: int) -> Mesh:
    """Mesh over the first n_stream*n_ch available devices (friendly
    error, then delegates to the package's one mesh constructor)."""
    from pysdr_tpu.parallel import mesh as mesh_mod
    have = len(jax.devices())
    if have < n_stream * n_ch:
        raise ValueError(
            f"--mesh {n_stream},{n_ch} needs {n_stream * n_ch} devices "
            f"but only {have} are available (emulate with JAX_PLATFORMS"
            f"=cpu XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_stream * n_ch})")
    return mesh_mod.make_mesh(n_stream=n_stream, n_ch=n_ch)


def _check_ch_divides(n_items: int, mesh: Mesh, what: str):
    n_ch_axis = mesh.shape.get("ch", 1)
    if n_items % n_ch_axis:
        raise ValueError(
            f"the mesh 'ch' axis ({n_ch_axis}) must divide the "
            f"{what} count ({n_items})")


class ShardedStreamBank:
    """ReceiverBank across a stream x ch mesh, executive-compatible."""

    def __init__(self, bank, mesh: Mesh, halo: int | None = None):
        # own attributes (writes to anything else forward to the bank —
        # see __setattr__)
        object.__setattr__(self, "bank", bank)
        self.mesh = mesh
        _check_ch_divides(bank.n_rx, mesh, "receiver")
        d = bank.design
        self._s = mesh.shape["stream"]
        seg = d.in_block
        self._proc, self.halo = stream_mod.make_streaming_processor(
            bank, mesh, seg, halo)
        aseg = seg * d.up // d.down
        self.design = types.SimpleNamespace(
            fs_in=d.fs_in, fs_out=d.fs_out, up=d.up, down=d.down,
            in_block=self._s * seg, out_block=self._s * aseg)
        self._tail = jax.numpy.zeros((self.halo, 2), jax.numpy.float32)
        self._nb = jax.numpy.zeros((bank.n_rx,), jax.numpy.int32)
        self._bb = jax.numpy.zeros((bank.n_rx,), jax.numpy.int32)
        # carried per-channel demod recurrence state (AGC env, squelch
        # latch, mute hold, ...) seeded from the serial bank's init tree
        self._dstate = bank.state.ch.demod
        self._last_bb = None

    @property
    def n_rx(self) -> int:
        return self.bank.n_rx

    def step_device(self, x_p):
        """x_p: packed (S*seg, 2) float32 OR an int8/int16 wire block
        (dequantized on device before the halo exchange). Audio returns
        in the bank's audio-wire dtype; the per-channel baseband lands in
        _last_bb when the bank emits it (the RTTY tap)."""
        (audio, self._nb, self._bb, self._tail, self._dstate,
         self._last_bb) = self._proc(
            x_p, self.bank.params, self._tail, self._nb, self._bb,
            self._dstate)
        return audio

    # control plane: delegate everything else (set_mode, retune,
    # set_af_gain, set_squelch, params, cfg, ...) to the wrapped bank
    def __getattr__(self, name):
        return getattr(self.bank, name)

    # attributes the adapter owns; everything else the wrapped bank
    # already has is written THROUGH (a read-only facade silently
    # swallowed writes like `adapter.on_device_retune = cb` — the trap
    # app.py once had to work around with getattr(bank, "bank", bank))
    _OWN_ATTRS = frozenset({
        "bank", "mesh", "halo", "design", "_s", "_proc", "_tail",
        "_nb", "_bb", "_dstate", "_last_bb", "_w_re", "_w_im"})

    def __setattr__(self, name, value):
        bank = self.__dict__.get("bank")
        if name in self._OWN_ATTRS or bank is None \
                or not hasattr(bank, name):
            object.__setattr__(self, name, value)
        else:
            setattr(bank, name, value)


class ShardedChannelizerBank:
    """ChannelizerBank across a stream x ch mesh, executive-compatible.

    With n_stream == 1 this still goes through the streaming processor
    (carried tail + phase bases), giving a pure channel-sharded bank
    whose FIR state is exact across calls."""

    _OWN_ATTRS = ShardedStreamBank._OWN_ATTRS

    def __init__(self, cb, mesh: Mesh, halo: int | None = None):
        from jax.sharding import NamedSharding, PartitionSpec as P
        object.__setattr__(self, "bank", cb)
        self.mesh = mesh
        _check_ch_divides(cb.n_ch, mesh, "channel")
        self._s = mesh.shape["stream"]
        seg = cb.in_block
        self._proc, self.halo = \
            chanshard_mod.make_channelizer_streaming_processor(
                cb, mesh, seg, halo)
        self.design = types.SimpleNamespace(
            fs_in=cb.cfg.fs_in, fs_out=cb.plan.fs_out,
            up=cb.plan.up, down=cb.plan.down,
            in_block=self._s * seg,
            out_block=self._s * cb.out_block)
        jnp = jax.numpy
        # place the DFT factors with their final sharding once, instead
        # of committing to device 0 and resharding every call
        self._w_re = jax.device_put(
            np.asarray(cb.w_re), NamedSharding(mesh, P(None, "ch")))
        self._w_im = jax.device_put(
            np.asarray(cb.w_im), NamedSharding(mesh, P(None, "ch")))
        self._tail = jnp.zeros((self.halo, 2), jnp.float32)
        self._nb = jnp.zeros((cb.n_ch,), jnp.int32)
        self._bb = jnp.zeros((cb.n_ch,), jnp.int32)
        # carried per-channel demod recurrence state (see stream.py)
        self._dstate = cb.state.demod
        self._last_bb = None

    @property
    def n_rx(self) -> int:
        return self.bank.n_ch

    def step_device(self, x_p):
        audio, self._nb, self._bb, self._tail, self._dstate = self._proc(
            x_p, self.bank.params, self._w_re, self._w_im,
            self._tail, self._nb, self._bb, self._dstate)
        return audio

    def __getattr__(self, name):
        return getattr(self.bank, name)

    __setattr__ = ShardedStreamBank.__setattr__
