"""Control plane: hamlib server/client, UDP protocol, hopper, presets."""

import time

import numpy as np
import pytest

from pysdr_tpu.config import PipelineConfig, ReceiverConfig
from pysdr_tpu.io import synth
from pysdr_tpu.models.receiver import ReceiverBank
from pysdr_tpu.runtime import hamlib, hopper, presets, rig, udp
from pysdr_tpu.runtime.executive import Executive
from pysdr_tpu.tables import Mode


def _mk_exec():
    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=1024, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM),))
    bank = ReceiverBank(cfg)
    src = synth.SynthSource(
        [synth.SignalSpec(offset_hz=60e3, mode="am")], fs=512e3)
    return Executive(bank, src), bank


def test_hamlib_server_roundtrip():
    ex, bank = _mk_exec()
    srv = hamlib.HamlibServer(ex, 0, port=0)  # ephemeral port
    srv.start()
    try:
        port = srv.server.server_address[1]
        assert hamlib.rigctl_request(port, "f").strip() == "10000000"
        assert hamlib.rigctl_request(port, "F 7074000").strip() == "RPRT 0"
        assert hamlib.rigctl_request(port, "M USB 2400").strip() == "RPRT 0"
        ex.run(n_blocks=1)  # applies queued commands
        assert bank._rx_cfgs[0].fc_hz == 7074000
        assert bank._rx_cfgs[0].mode == Mode.USB
        mode_reply = hamlib.rigctl_request(port, "m")
        assert mode_reply.splitlines()[0] == "USB"
        assert hamlib.rigctl_request(port, "v").strip() == "VFOA"
        assert "0\n" in hamlib.rigctl_request(port, "\\dump_state")
    finally:
        srv.stop()


def test_rig_client_against_our_server():
    ex, bank = _mk_exec()
    srv = hamlib.HamlibServer(ex, 0, port=0).start()
    try:
        port = srv.server.server_address[1]
        rc = rig.RigConnection(port=port)
        assert rc.active
        assert rc.get_freq() == 10e6
        rc.set_freq(14.2e6)
        ex.run(n_blocks=1)
        assert bank._rx_cfgs[0].fc_hz == 14.2e6
        assert rc.get_vfo() == "A"
        rc.close()
    finally:
        srv.stop()


def test_rig_follower_hysteresis():
    ex, bank = _mk_exec()

    class FakeRig:
        active = True
        f = 10e6 + 5.0  # within 20 Hz: no retune
        def get_freq(self):
            return self.f
    fr = rig.RigFollower(ex, FakeRig(), follow_band=True)
    fr.poll_once()
    assert ex._cmd_q.empty()
    fr.rig.f = 10.1e6
    fr.poll_once()
    assert not ex._cmd_q.empty()


def test_udp_protocol():
    ex, bank = _mk_exec()
    h = udp.UdpMsgHandler(ex, mode_name="AM")
    assert h.handle("Name:?\n") == ["Name:pysdr-tpu\n"]
    assert h.handle("MODE:?\n") == ["MODE:AM\n"]
    h.handle("SO2V:ON\n")
    assert h.so2v and h.auto_mute
    h.handle("SPLIT:OFF\nSO2V:OFF\n")
    assert not h.auto_mute
    h.handle("SpotList:20m:[('W1AW',14030.0,'k'),('AA2IL',14040.0,'b')]\n")
    assert len(h.spots.all()) == 2
    h.handle("LOG:W1AW:20m:14030.0:CW:x:y\n")
    assert [s.color for s in h.spots.all() if s.call == "W1AW"] == ["r"]
    r = h.handle("SpotFreq:?\n")
    assert r == ["SpotFreq:14040.000\n"]
    r = h.handle("RunFreq:14000:14060\n")
    f = float(r[0].split(":")[1])
    assert 14000 < f < 14060
    # mode set via UDP goes through the command queue
    h.handle("MODE:CW\n")
    ex.run(n_blocks=1)
    assert bank._rx_cfgs[0].mode == Mode.CW


def test_udp_server_datagrams():
    import socket
    h = udp.UdpMsgHandler()
    srv = udp.UdpServer(h, port=0).start()
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.settimeout(2.0)
        s.sendto(b"Name:?\n", ("127.0.0.1", srv.port))
        data, _ = s.recvfrom(1024)
        assert data == b"Name:pysdr-tpu\n"
    finally:
        srv.stop()


def test_hopper_expansion_and_hop():
    ex, bank = _mk_exec()
    hl = hopper.expand_hop_list(["20m:FT8", "40m:CW1", (7.1e6, "AM"), "FT4"])
    assert (14074e3, Mode.IQ) in hl
    assert (7010e3, Mode.CW) in hl
    assert (7.1e6, Mode.AM) in hl
    assert len([h for h in hl if h[1] == Mode.IQ]) >= 10  # FT4 expansion
    hp = hopper.FreqHopper(ex, ["20m:FT8", "40m:FT8"], dwell_s=100)
    f1, _ = hp.hop_once()
    f2, _ = hp.hop_once()
    f3, _ = hp.hop_once()
    assert (f1, f2, f3) == (14074e3, 7074e3, 14074e3)
    ex.run(n_blocks=1)
    assert bank._rx_cfgs[0].fc_hz == 14074e3  # last applied wins


def test_freq2band():
    assert hopper.freq2band(14.074e6) == "20m"
    assert hopper.freq2band(7.0e6) == "40m"
    assert hopper.freq2band(146e6) == "?"


def test_presets(tmp_path):
    p = tmp_path / "p.json"
    p.write_text('{"presets": [{"name": "X", "freq_hz": 7074000,'
                 ' "mode": "USB", "group": "digi"}],'
                 ' "hops": {"6": ["20m:FT8"]}}')
    pr, hops = presets.load(str(p))
    names = [q.name for q in pr]
    assert "WWV10" in names and "X" in names
    assert hops == {6: ["20m:FT8"]}
    g = presets.groups(pr)
    assert "digi" in g and "builtin" in g
    c = tmp_path / "p.csv"
    c.write_text("KPBS,89500000,WFM,fm\n")
    pr2 = presets.load_csv(str(c))
    assert pr2[0].mode == Mode.WFM


def test_rig_clarifier_rit_roundtrip():
    """Clarifier/RIT sync: setting RIT on the 'rig' (our hamlib server)
    shifts the RX without moving the dial, and the follower's
    read_clarifier path sees it (reference rig_retune clarifier
    handling, gui.py:1402-1483)."""
    ex, bank = _mk_exec()
    srv = hamlib.HamlibServer(ex, 0, port=0).start()
    try:
        port = srv.server.server_address[1]
        rc = rig.RigConnection(port=port)
        assert rc.read_clarifier() == 0.0
        rc.set_clarifier(150.0)
        ex._apply_pending()
        # RX listens 150 Hz up; the dial still reads the base frequency
        assert bank._rx_cfgs[0].fc_hz == 10e6 + 150.0
        assert rc.get_freq() == 10e6
        assert rc.read_clarifier() == 150.0
        # dial moves with RIT held: RX tracks dial + RIT
        rc.set_freq(14.2e6)
        ex._apply_pending()
        assert bank._rx_cfgs[0].fc_hz == 14.2e6 + 150.0
        assert rc.get_freq() == 14.2e6
        rc.close()
    finally:
        srv.stop()


def test_rit_then_freq_before_block_boundary():
    """ADVICE r3: back-to-back F/J commands inside one block used to
    compute the dial from the not-yet-applied bank config (retunes land
    only at block boundaries) and tune to the wrong frequency. The dial
    is now authoritative in RigState and updated synchronously."""
    ex, bank = _mk_exec()
    srv = hamlib.HamlibServer(ex, 0, port=0).start()
    try:
        port = srv.server.server_address[1]
        rc = rig.RigConnection(port=port)
        # F then J with NO _apply_pending in between (same block)
        rc.set_freq(14.2e6)
        rc.set_clarifier(100.0)
        ex._apply_pending()
        assert bank._rx_cfgs[0].fc_hz == 14.2e6 + 100.0
        assert rc.get_freq() == 14.2e6
        # two J commands inside one block: second derives from the same
        # authoritative dial, not the stale cfg
        rc.set_clarifier(-50.0)
        rc.set_clarifier(25.0)
        ex._apply_pending()
        assert bank._rx_cfgs[0].fc_hz == 14.2e6 + 25.0
        assert rc.get_freq() == 14.2e6
        # an EXTERNAL retune (viewer/hopper posts straight to the bank)
        # resyncs the dial on the next read
        ex.post("retune", 0, 7.0e6 + 25.0)
        ex._apply_pending()
        assert rc.get_freq() == 7.0e6
        rc.close()
    finally:
        srv.stop()


def test_hop_schedule_file(tmp_path):
    """--hop-schedule: hour-keyed rules file -> FreqHopper schedule (the
    reference presets 'Hops' sheet keyed by hour, hopper.py:74-111)."""
    f = tmp_path / "hops.txt"
    f.write_text(
        "# overnight lows\n"
        "0-5:   80m:FT8 160m:FT8\n"
        "6-17:  FT8\n"
        "18-23: 40m:FT8 7.040 40m:CW1\n")
    sched = hopper.load_hop_schedule(str(f))
    assert set(sched) == set(range(24))
    assert sched[2] == ["80m:FT8", "160m:FT8"]
    assert sched[19][1] == pytest.approx(7.04e6)

    ex, bank = _mk_exec()
    h = hopper.FreqHopper(ex, [], dwell_s=0.01,
                          schedule={k: v for k, v in sched.items()})
    # whatever the current hour, a schedule entry exists -> hops resolve
    hops = h.current_hops()
    assert hops and all(isinstance(f_, float) for f_, _ in hops)
    got = h.hop_once()
    assert got is not None
    ex._apply_pending()
    assert bank._rx_cfgs[0].fc_hz == got[0]


def test_hop_schedule_bad_file(tmp_path):
    f = tmp_path / "bad.txt"
    f.write_text("25: FT8\n")
    with pytest.raises(ValueError):
        hopper.load_hop_schedule(str(f))


def test_hamlib_prune_keeps_pending_target_with_rit():
    """ADVICE r4: pruning _known_fc at >64 entries must keep the most
    recent posted target. Scenario: set_freq posts retune T1 = dial +
    rit1; before the executive drains, set_rit changes the clarifier and
    its _post_retune trips the prune, wiping T1 from the consistency
    set. When the executive then applies T1 (with T2 still queued
    behind it), a concurrently-polling client (wsjtx at 1 Hz) calling
    get_freq must NOT see T1 classified as an external retune — the
    pre-fix resync reported dial = T1 - rit2 = dial + rit1 - rit2,
    briefly wrong by the RIT delta."""
    ex, bank = _mk_exec()
    state = hamlib.RigState(ex, 0)
    state.set_rit(500.0)
    ex.run(n_blocks=1)
    # grow the consistency set to exactly the prune threshold (64),
    # fully drained each time so every entry is an applied fc
    for k in range(62):
        state.set_freq(14e6 + k * 1e3)
        ex.run(n_blocks=k + 2)          # n_blocks is cumulative
    assert len(state._known_fc) == 64
    dial = 7.1e6
    state.set_freq(dial)                # posts T1 = dial + 500 (pending)
    assert len(state._known_fc) == 65
    state.set_rit(200.0)                # prune fires here; posts T2
    # apply ONLY T1 (the executive drains commands one at a time; a
    # polling client can observe the state between T1 and T2)
    method, args = ex._cmd_q.get_nowait()
    getattr(bank, method)(*args)
    assert bank._rx_cfgs[0].fc_hz == dial + 500.0
    assert state.get_freq() == dial, \
        "pending retune misread as external: dial resynced to fc - rit"
    # T2 lands at the next boundary and the dial is still right
    method, args = ex._cmd_q.get_nowait()
    getattr(bank, method)(*args)
    assert bank._rx_cfgs[0].fc_hz == dial + 200.0
    assert state.get_freq() == dial
