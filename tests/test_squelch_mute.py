"""Squelch open/close/hysteresis and per-RX / auto-mute behavior.

Squelch spec being verified (re-derived from reference sigs/squelch.m:
100-137): in-band vs out-of-band magnitude envelopes (one-pole alpha=0.001)
whose ratio drives a hysteresis gate — open above the threshold, close
below hyst*threshold, hold in between. Mute spec: reference P.MUTED[irx]
(receiver.py:168-197) and rx.auto_mute with a 0.25 s hold
(receiver.py:237-245, params.py:447-450), armed from UDP SO2V/SPLIT
(udp.py:43-60).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pysdr_tpu.config import PipelineConfig, ReceiverConfig
from pysdr_tpu.ops import demod
from pysdr_tpu.runtime.udp import UdpMsgHandler
from pysdr_tpu.tables import Mode

FS = 48e3
DESIGN = demod.DemodDesign(fs_out=FS)
CT = jnp.asarray(DESIGN.carrier_filter())
PT = jnp.asarray(DESIGN.pilot_filter())


def usb_two_tone(n, a_in, a_out, f_in=1500.0, f_out=9000.0):
    """USB-mode probe: in-band tone at f_in (inside a 3 kHz AF filter)
    plus out-of-band tone at f_out (rejected by it). The squelch ratio is
    then ~a_in/a_out, directly controllable."""
    t = np.arange(n) / FS
    return (a_in * np.exp(2j * np.pi * f_in * t)
            + a_out * np.exp(2j * np.pi * f_out * t)).astype(np.complex64)


def run_blocks(iq, p, st, n_blocks=4):
    outs = []
    for b in np.split(iq, n_blocks):
        audio, st = demod.demod_block(jnp.asarray(b), st, p, DESIGN, CT, PT)
        outs.append(np.asarray(audio))
    return np.concatenate(outs), st


def make_usb_params(squelch_db, **kw):
    return demod.make_params(DESIGN, Mode.USB, af_bw_hz=3e3, agc_on=False,
                             squelch_db=squelch_db, **kw)


def test_squelch_opens_on_strong_signal():
    p = make_usb_params(squelch_db=12.0)          # open above 15.8x power
    iq = usb_two_tone(32768, a_in=1.0, a_out=0.05)  # power ratio 400x
    audio, _ = run_blocks(iq, p, demod.init_state(DESIGN))
    assert np.mean(np.abs(audio[-8192:])) > 0.3


def test_squelch_closes_on_out_of_band_noise():
    p = make_usb_params(squelch_db=12.0)
    iq = usb_two_tone(32768, a_in=0.02, a_out=1.0)  # ratio 0.02x
    audio, _ = run_blocks(iq, p, demod.init_state(DESIGN))
    assert np.mean(np.abs(audio[-8192:])) < 0.01


def test_squelch_threshold_accuracy():
    """Gate must open for ratios clearly above threshold and stay closed
    clearly below (starting from the closed state both times)."""
    p = make_usb_params(squelch_db=12.0)          # open at 15.8x (power)
    st0 = demod.init_state(DESIGN)
    # drive it closed first with out-of-band noise
    closed_iq = usb_two_tone(16384, a_in=0.01, a_out=1.0)
    _, st_closed = run_blocks(closed_iq, p, st0, n_blocks=2)

    above, st = run_blocks(usb_two_tone(32768, 1.0, 0.125), p, st_closed)
    assert np.mean(np.abs(above[-8192:])) > 0.3    # 64x > 15.8 -> open
    _, st_closed2 = run_blocks(closed_iq, p, st0, n_blocks=2)
    below, _ = run_blocks(usb_two_tone(32768, 1.0, 0.5), p, st_closed2)
    assert np.mean(np.abs(below[-8192:])) < 0.02   # 4x < 7.9 -> closed


def test_squelch_hysteresis_holds_state():
    """A ratio between close (hyst*T) and open (T) must HOLD the previous
    gate: open stays open, closed stays closed."""
    p = make_usb_params(squelch_db=12.0)   # open 15.8x, close 7.9x (power)
    mid_iq = usb_two_tone(32768, a_in=1.0, a_out=0.30)  # power ratio ~11x

    # (a) previously OPEN -> stays open
    st0 = demod.init_state(DESIGN)         # init gate = open
    strong, st_open = run_blocks(usb_two_tone(16384, 1.0, 0.05), p, st0,
                                 n_blocks=2)
    mid_a, _ = run_blocks(mid_iq, p, st_open)
    assert np.mean(np.abs(mid_a[-8192:])) > 0.3

    # (b) previously CLOSED -> stays closed
    _, st_closed = run_blocks(usb_two_tone(16384, 0.01, 1.0), p, st0,
                              n_blocks=2)
    mid_b, _ = run_blocks(mid_iq, p, st_closed)
    assert np.mean(np.abs(mid_b[-8192:])) < 0.02


def test_squelch_off_passes_everything():
    p = make_usb_params(squelch_db=-150.0)
    iq = usb_two_tone(16384, a_in=0.001, a_out=1.0)
    audio, _ = run_blocks(iq, p, demod.init_state(DESIGN), n_blocks=2)
    assert np.mean(np.abs(audio[-4096:])) > 1e-4


# ---------------------------------------------------------------------------
# mute / auto-mute
# ---------------------------------------------------------------------------

def test_per_rx_mute_silences_audio():
    p = demod.make_params(DESIGN, Mode.AM, agc_on=False, muted=True)
    t = np.arange(16384) / FS
    iq = ((1 + 0.5 * np.sin(2 * np.pi * 1000 * t))
          ).astype(np.complex64)
    audio, _ = run_blocks(iq, p, demod.init_state(DESIGN), n_blocks=2)
    assert np.max(np.abs(audio)) == 0.0


def test_auto_mute_trips_and_releases():
    """A strong block trips the mute; it releases after the 0.25 s hold
    once the signal weakens (reference MUTE_TIME, params.py:447-450)."""
    p = demod.make_params(DESIGN, Mode.AM, agc_on=False, auto_mute=True,
                          auto_mute_db=-10.0)
    st = demod.init_state(DESIGN)
    blk = 4096
    t = np.arange(blk) / FS

    def am_block(amp):
        return (amp * (1 + 0.5 * np.sin(2 * np.pi * 1000 * t))
                ).astype(np.complex64)

    weak, strong = am_block(0.05), am_block(2.0)   # -23 dBFS vs +7 dBFS
    a0, st = run_blocks(weak, p, st, n_blocks=1)
    assert np.max(np.abs(a0[2048:])) > 0.001        # plays while weak
    a1, st = run_blocks(strong, p, st, n_blocks=1)
    assert np.max(np.abs(a1)) == 0.0                # muted instantly
    # hold = 0.25 s = 12000 samples ~ 3 blocks of weak signal
    for _ in range(3):
        a2, st = run_blocks(weak, p, st, n_blocks=1)
        assert np.max(np.abs(a2)) == 0.0
    a3, st = run_blocks(weak, p, st, n_blocks=1)    # hold expired
    assert np.max(np.abs(a3[2048:])) > 0.001


def test_auto_mute_disarmed_ignores_strong_sig():
    p = demod.make_params(DESIGN, Mode.AM, agc_on=False, auto_mute=False)
    t = np.arange(8192) / FS
    iq = (2.0 * (1 + 0.5 * np.sin(2 * np.pi * 1000 * t))
          ).astype(np.complex64)
    audio, _ = run_blocks(iq, p, demod.init_state(DESIGN), n_blocks=2)
    assert np.max(np.abs(audio[4096:])) > 0.001


class FakeExec:
    def __init__(self):
        self.posts = []

    def post(self, method, *args):
        self.posts.append((method, args))


def test_udp_so2v_arms_auto_mute():
    """SO2V:ON must arm auto-mute on all RXs and unmute RX0; OFF disarms
    (reference udp.py:43-60)."""
    ex = FakeExec()
    h = UdpMsgHandler(executive=ex)
    h.handle("SO2V:ON\n")
    assert ("set_auto_mute_all", (True,)) in ex.posts
    assert ("set_mute", (0, False)) in ex.posts
    ex.posts.clear()
    h.handle("SO2V:OFF\n")
    assert ("set_auto_mute_all", (False,)) in ex.posts
    assert ("set_mute", (0, True)) in ex.posts


def test_bank_mute_roundtrip():
    """Bank-level: set_mute / set_auto_mute are pure params swaps the
    executive applies between blocks."""
    from pysdr_tpu.models.receiver import ReceiverBank
    cfg = PipelineConfig(fs_in=512e3, fs_out=48e3, out_block=2048,
                         foffset_hz=60e3,
                         receivers=(ReceiverConfig(fc_hz=100e6,
                                                   mode=Mode.AM),))
    bank = ReceiverBank(cfg)
    d = bank.design
    t = np.arange(d.in_block) / d.fs_in
    x = (0.5 * np.exp(2j * np.pi * 60e3 * t)).astype(np.complex64)
    a0 = bank.step(x)
    bank.set_mute(0, True)
    a1 = bank.step(x)
    bank.set_mute(0, False)
    a2 = bank.step(x)
    assert np.max(np.abs(a1)) == 0.0
    assert np.max(np.abs(a0)) > 0 and np.max(np.abs(a2)) > 0
