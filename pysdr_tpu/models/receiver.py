"""The receiver: NCO mix -> polyphase decimate -> demod -> AGC, as one pure
block-processing function, vmapped into an arbitrary-N channel bank.

Reference architecture being re-expressed (NOT translated): the
`SDR_EXECUTIVE.Run` hot loop drives up to MAX_RX=6 `dsp.Receiver` chains,
each `lo -> dec -> demod -> agc` with mutable hot-swapped filters
(reference receiver.py:684-782, 825-835; chain members §2.9 of SURVEY.md).
Here one jitted `process_block(state, iq, params) -> (state, audio)` holds
the whole chain; the channel axis is a vmap (sharded across devices in
parallel/); every GUI-mutable quantity (NCO frequency, filter-bank row,
mode, gains) is a *traced* per-channel value in ChannelParams, so all the
reference's control-plane mutations (FreqSelect gui.py:1900-2038,
Video_BWSelect gui.py:1672-1714, ModeSelect gui.py:2042-2078) become pure
data swaps between blocks — zero recompiles, matching the reference's
block-boundary mutation discipline (receiver.py:633-680).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pysdr_tpu import config as cfg_mod
from pysdr_tpu import tables
from pysdr_tpu.ops import cplx
from pysdr_tpu.ops import demod as demod_ops
from pysdr_tpu.ops import fir, nco, resample
from pysdr_tpu.tables import Mode


class ChannelParams(NamedTuple):
    """Per-channel traced parameters (leading axis = channel in the bank)."""
    nco_k: jax.Array           # int32 () NCO numerator (offset in passband)
    video_row: jax.Array       # int32 () index into the video weight bank
    demod: demod_ops.DemodParams


class ChannelState(NamedTuple):
    nco_phase: jax.Array       # int32 ()
    rs_hist: jax.Array         # complex64 (Kp-1,) resampler history
    demod: demod_ops.DemodState


@dataclasses.dataclass(frozen=True)
class ReceiverDesign:
    """Static design: everything that selects the compiled executable."""
    fs_in: float
    fs_out: float
    up: int
    down: int
    in_block: int
    out_block: int
    video_taps: int            # prototype length (up * taps_per_phase)
    demod: demod_ops.DemodDesign

    @classmethod
    def from_config(cls, cfg: cfg_mod.PipelineConfig) -> "ReceiverDesign":
        plan = cfg.plan
        tpp = cfg.video_taps_per_phase or max(
            16, int(np.ceil(8 * plan.down / plan.up)))
        return cls(fs_in=cfg.fs_in, fs_out=plan.fs_out, up=plan.up,
                   down=plan.down, in_block=plan.in_block,
                   out_block=plan.out_block, video_taps=plan.up * tpp,
                   demod=demod_ops.DemodDesign(fs_out=plan.fs_out,
                                               af_taps=cfg.af_taps))


def channel_step(x, state: ChannelState, p: ChannelParams,
                 design: ReceiverDesign, video_bank, carrier_taps,
                 pilot_taps):
    """One channel, one block: the whole `demodulate_data` equivalent
    (reference receiver.py:231-297). x: complex64 (in_block,) shared RF
    block. Returns (audio complex64 (out_block,), new_state)."""
    y, phase = nco.mix_down(x, p.nco_k, state.nco_phase)
    w = jnp.asarray(video_bank)[p.video_row]
    bb, rs_hist = resample.resample_block(
        y, state.rs_hist, w, up=design.up, down=design.down)
    audio, dstate = demod_ops.demod_block(
        bb, state.demod, p.demod, design.demod, carrier_taps, pilot_taps)
    return audio, ChannelState(nco_phase=phase, rs_hist=rs_hist,
                               demod=dstate), bb


class ReceiverBank:
    """N independent receivers inside one passband + host control plane.

    The arbitrary-N generalization of the reference's MAX_RX=6 RX bank
    (params.py:33): one vmap over the channel axis; all per-channel knobs
    traced. Functional core: `step(state, x) -> (state, audio)`; the
    mutating methods only rewrite the host-side params arrays (pure data,
    applied at the next block boundary).
    """

    def __init__(self, cfg: cfg_mod.PipelineConfig, emit_baseband=False):
        cfg_mod.validate(cfg)
        self.cfg = cfg
        self.design = ReceiverDesign.from_config(cfg)
        d = self.design
        # Video (anti-alias) weight bank: one packed conv weight per
        # VIDEO_BWs row (reference dec.filter_bank, gui.py:1672-1714).
        self.video_bws = [bw for bw in tables.VIDEO_BWS_HZ
                          if bw == 0.0 or bw <= d.fs_out]
        proto = fir.video_filter_bank(d.fs_in, d.up, d.down, self.video_bws,
                                      taps_per_phase=d.video_taps // d.up)
        # Constants are kept as HOST numpy arrays: embedding a device
        # array as a jit closure constant forces a device->host pull at
        # lowering time, which this backend cannot do for some layouts;
        # numpy constants are baked straight into the executable. Complex
        # constants additionally stay packed float (ops/cplx.py).
        self.video_bank = resample.pack_weight_bank(proto, d.up, d.down)
        self.video_proto = proto   # for the internals dump (receiver.py:864)
        self.carrier_taps = cplx.pack(d.demod.carrier_filter())
        self.pilot_taps = cplx.pack(d.demod.pilot_filter())
        self.emit_baseband = emit_baseband

        self._rx_cfgs = list(cfg.receivers)
        self.params = self._build_params()
        state_c = self.init_state()
        self.state, self._state_mask = cplx.pack_tree(state_c)

        self._step = jax.jit(self._step_impl)

    # ---------- construction ----------

    def _params_for(self, rc: cfg_mod.ReceiverConfig,
                    offset_hz: float) -> ChannelParams:
        d = self.design
        video_bw = rc.video_bw_hz
        if video_bw <= 0:
            row = 0
        else:
            row = tables.find_filter_index(video_bw, self.video_bws)
        dp = demod_ops.make_params(
            d.demod, rc.mode, af_bw_hz=rc.af_bw_hz, bfo_hz=rc.bfo_hz,
            af_gain=rc.af_gain, squelch_db=rc.squelch_db,
            agc_on=rc.agc_enabled)
        return ChannelParams(
            nco_k=jnp.int32(nco.snap_freq(offset_hz, d.fs_in)),
            video_row=jnp.int32(row), demod=dp)

    def _build_params(self) -> ChannelParams:
        offs = self.cfg.channel_offsets_hz()
        plist = [self._params_for(rc, off)
                 for rc, off in zip(self._rx_cfgs, offs)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *plist)

    def init_state(self) -> ChannelState:
        d = self.design
        one = ChannelState(
            nco_phase=jnp.zeros((), jnp.int32),
            rs_hist=jnp.zeros(resample.history_len(d.video_taps, d.up),
                              jnp.complex64),
            demod=demod_ops.init_state(d.demod))
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.n_rx,) + x.shape).copy(),
            one)

    @property
    def n_rx(self) -> int:
        return len(self._rx_cfgs)

    # ---------- functional core ----------

    def _step_impl(self, state_p, x_p, params):
        """Packed-boundary step: state_p/x_p/audio are float32 re-im
        pairs; complex64 exists only inside this jit."""
        x = cplx.unpack(x_p)
        state = cplx.unpack_tree(state_p, self._state_mask)

        def one(st, pr):
            return channel_step(x, st, pr, self.design, self.video_bank,
                                self.carrier_taps, self.pilot_taps)
        audio, new_state, bb = jax.vmap(one)(state, params)
        new_state_p, _ = cplx.pack_tree(new_state)
        # outputs flattened to 1-D: multi-dim jit outputs can get device
        # layouts this backend cannot transfer to host (ops/cplx.py notes)
        out = (cplx.pack(audio).reshape(-1),
               cplx.pack(bb).reshape(-1) if self.emit_baseband else None)
        return new_state_p, out

    def step(self, x):
        """Host convenience: process one RF block (in_block complex64 on
        the host). Returns host audio (n_rx, out_block) complex64;
        advances internal state."""
        audio_flat = np.asarray(self.step_device(self.to_device_block(x)))
        return cplx.unpack(
            audio_flat.reshape(self.n_rx, self.design.out_block, 2))

    def to_device_block(self, x):
        """Host complex block -> device packed pair (n, 2)."""
        if jnp.iscomplexobj(x):
            return jnp.asarray(cplx.pack(np.asarray(x)))
        return jnp.asarray(x)

    def step_device(self, x_p):
        """Device-native step: x_p float32 (in_block, 2) packed; returns
        packed audio flattened (n_rx*out_block*2,) on device (no host
        transfer — the bench path)."""
        self.state, (audio_p, bb) = self._step(self.state, x_p, self.params)
        self._last_bb = bb
        return audio_p

    def step_functional(self, state_p, x_p, params):
        return self._step(state_p, x_p, params)

    # ---------- control plane (block-boundary mutations) ----------

    def _update(self, i: int, **changes):
        self._rx_cfgs[i] = dataclasses.replace(self._rx_cfgs[i], **changes)
        self.params = self._build_params()

    def retune(self, i: int, fc_hz: float):
        """Reference FreqSelect (gui.py:1900-2038): main RX retune moves
        the device center (a host/source concern — see runtime/); sub-RX
        retunes re-derive the NCO offsets. Here both are the same pure
        update of the per-channel NCO numerators."""
        self._update(i, fc_hz=fc_hz)

    def set_mode(self, i: int, mode: Mode):
        self._update(i, mode=tables.Mode(mode))

    def set_video_bw(self, i: int, bw_hz: float):
        self._update(i, video_bw_hz=bw_hz)

    def set_af_bw(self, i: int, bw_hz: float):
        self._update(i, af_bw_hz=bw_hz)

    def set_af_gain(self, i: int, gain: float):
        self._update(i, af_gain=gain)

    def set_squelch(self, i: int, level_db: float):
        self._update(i, squelch_db=level_db)

    def set_agc(self, i: int, enabled: bool):
        self._update(i, agc_enabled=enabled)

    # ---------- verification harness ----------

    def dump_internals(self) -> dict:
        """Filter-bank dump for numerical cross-validation — the
        `internals.mat` harness (reference receiver.py:864-874,
        sigs/internals.m)."""
        d = self.design
        return {
            "up": d.up, "down": d.down, "fs_in": d.fs_in,
            "fs_out": d.fs_out,
            "video_filter_bank": np.asarray(self.video_proto),
            "carrier_filter": np.asarray(self.carrier_taps),
            "af_banks": {i: np.asarray(p.af_taps)
                         for i, p in enumerate(
                             [self._params_for(rc, 0.0).demod
                              for rc in self._rx_cfgs])},
        }
