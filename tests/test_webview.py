"""Live web viewer: binary waterfall frames + the full per-RX control
surface over HTTP while the executive streams (the reference's interactive
loop — gui.py:1222-1398 UpdatePSD, 1900-2038 FreqSelect, 382-468 per-RX
gain/mute, 1672-1765 BW menus, 1769-1896 SO2V mouse semantics — without
Qt)."""

import base64
import json
import time
import urllib.request

import numpy as np

from pysdr_tpu import app as app_mod
from pysdr_tpu.tables import Mode


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.read()


def _mk_app(extra=()):
    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--web", "0",
         "--psd-every", "1", *extra])
    a = app_mod.App(args)
    a.start_services()
    return a


def test_webview_live_tune():
    a = _mk_app()
    try:
        port = a.web.port
        page = _get(port, "/")
        assert b"pysdr_tpu" in page and b"canvas" in page
        assert json.loads(_get(port, "/frame.json"))["ok"] is False
        th = a.ex.run_in_thread(n_blocks=20)
        fr = {"ok": False}
        deadline = time.monotonic() + 120
        while not fr["ok"] and time.monotonic() < deadline:
            time.sleep(0.2)
            fr = json.loads(_get(port, "/frame.json"))
        assert fr["ok"], "no display frame while streaming"
        assert fr["rx"][0]["fc"] == 0.6e6
        rf = fr["rf"]
        assert len(rf["psd"]) > 100
        # binary waterfall wire: base64 u8 rows, not nested int lists
        wf = np.frombuffer(base64.b64decode(rf["wf_b64"]), np.uint8)
        assert wf.size == rf["rows"] * rf["cols"] and rf["rows"] > 10
        assert rf["f0"] < fr["rx"][0]["fc"] < rf["f1"]
        # selected RX's AF pane rides along
        assert "af" in fr and fr["af"]["rows"] > 10
        _get(port, "/tune?f=612345")
        _get(port, "/mode?m=NFM")
        th.join(timeout=120)
        assert not th.is_alive()
        a.ex._apply_pending()
        assert a.bank._rx_cfgs[0].fc_hz == 612345.0
        assert a.bank._rx_cfgs[0].mode == Mode.NFM
    finally:
        a.stop_services()
        a.ex.stop()


def test_webview_spot_snap():
    a = _mk_app()
    try:
        a.display.rf.spots.add(601500.0, "W1AW")
        _get(a.web.port, "/tune?f=601300")   # within 2 kHz -> snaps
        a.ex._apply_pending()
        assert a.bank._rx_cfgs[0].fc_hz == 601500.0
    finally:
        a.stop_services()


def test_webview_rx_controls_and_vfo():
    """Per-RX controls (gain/squelch/AF BW/video BW/mute) + dual-VFO
    mouse semantics: right-click tunes RX1, middle-click swaps RX0/RX1
    (reference gui.py:382-468, 1672-1765, 1769-1896)."""
    a = _mk_app(["--fc", "0.6", "0.62", "--modes", "AM", "NFM"])
    try:
        p = a.web.port
        _get(p, "/gain?rx=1&v=2.5")
        _get(p, "/squelch?rx=1&v=12")
        _get(p, "/afbw?rx=1&v=3000")
        _get(p, "/videobw?rx=1&v=10000")
        _get(p, "/mute?rx=1&v=1")
        a.ex._apply_pending()
        rc = a.bank._rx_cfgs[1]
        assert rc.af_gain == 2.5
        assert rc.squelch_db == 12.0
        assert rc.af_bw_hz == 3000.0
        assert rc.video_bw_hz == 10000.0
        assert rc.muted
        # VFO-B tune (right-click path = tune?rx=1)
        _get(p, "/tune?rx=1&f=615000")
        a.ex._apply_pending()
        assert a.bank._rx_cfgs[1].fc_hz == 615000.0
        # middle-click swap
        _get(p, "/vfo_swap")
        a.ex._apply_pending()
        assert a.bank._rx_cfgs[0].fc_hz == 615000.0
        assert a.bank._rx_cfgs[1].fc_hz == 0.6e6
    finally:
        a.stop_services()


def test_webview_udp_spots_render_and_snap():
    """A UDP SpotList datagram shows up in the viewer's frame and
    click-snap uses it (VERDICT r2 #9: one spot store, not two)."""
    import socket

    a = _mk_app(["--udp-port", "0"])
    try:
        lst = [("K6XYZ", 601.4, "b"), ("W1AW", 608.0, "k")]
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.sendto(f"SpotList:20m:{lst!r}\n".encode(),
                 ("127.0.0.1", a.udp_server.port))
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline and not len(a.display.rf.spots):
            time.sleep(0.05)
        assert len(a.display.rf.spots) == 2
        # spots ride the frame for overlay rendering (needs >= 1 frame)
        a.ex.run(n_blocks=2)
        fr = json.loads(_get(a.web.port, "/frame.json"))
        assert {sp["label"] for sp in fr["rf"]["spots"]} == \
            {"K6XYZ", "W1AW"}
        # click near the UDP spot -> snaps to it (kHz wire -> Hz)
        _get(a.web.port, "/tune?f=601300")
        a.ex._apply_pending()
        assert a.bank._rx_cfgs[0].fc_hz == 601400.0
    finally:
        a.stop_services()


def test_webview_rtty_panel():
    """The RTTY endpoint exposes per-channel decoded text AND the
    decoder-band waterfall live (reference RTTY window, rtty.py:92-371)."""
    a = _mk_app(["--rtty", "0", "--mode", "RTTY"])
    try:
        fr = json.loads(_get(a.web.port, "/frame.json"))
        assert fr["ok"] is False or fr["rtty"] is True
        # stream a few blocks so the decoder taps its spectrum
        a.ex.run(n_blocks=6)
        t0 = json.loads(_get(a.web.port, "/rtty.json"))
        assert "wf_b64" in t0 and t0["rows"] >= 1 and t0["cols"] > 64
        a.rtty.channels = [
            {"mark_bin": 40, "figs": False, "text": "CQ CQ DE W1AW",
             "snr_db": 12.0, "idle_scans": 0}]
        a.rtty_text.append("CQ CQ DE W1AW")
        t = json.loads(_get(a.web.port, "/rtty.json"))
        assert t["channels"][0]["text"].endswith("W1AW")
        assert t["channels"][0]["locked"]
        assert t["channels"][0]["freq_hz"] > 0
        assert t["lines"] == ["CQ CQ DE W1AW"]
    finally:
        a.stop_services()


def test_webview_pan_controls_and_presets():
    """Pan-adaptor DR / peaks controls (reference gui.py:521-598) mutate
    the display pipeline live (DR is a traced value - no recompile), and
    the preset list serves for the preset tabs (gui.py:408-435)."""
    a = _mk_app()
    try:
        p = a.web.port
        _get(p, "/display?dr=40&peaks=0")
        # pan changes queue through executive.post and land at the next
        # block boundary (no direct mutation from the HTTP thread)
        a.ex._apply_pending()
        assert a.display.rf.cfg.pan_dr_db == 40.0
        assert a.display.rf.cfg.use_peaks is False
        a.ex.run(n_blocks=2)        # pipeline still runs post-change
        ps = json.loads(_get(p, "/presets.json"))
        assert len(ps) > 3 and {"name", "freq_hz", "mode", "group"} \
            <= set(ps[0])
    finally:
        a.stop_services()


def test_webview_record_toggle(tmp_path):
    """Mid-run IQ recording start/stop from the viewer (the reference's
    save-raw GUI toggle, gui.py:1184-1219), applied at block boundaries."""
    import glob

    a = _mk_app()
    try:
        p = a.web.port
        a.ex.run(n_blocks=2)
        _get(p, f"/record?iq=1&dir={tmp_path}")
        a.ex.run(n_blocks=5)            # records blocks 3..5-ish
        _get(p, "/record?iq=0")
        a.ex.run(n_blocks=7)
        files = glob.glob(str(tmp_path / "raw_iq_*.dat"))
        assert len(files) == 1
        from pysdr_tpu.io import datfile
        x, hdr = datfile.read_dat(files[0])
        d = a.bank.design
        assert hdr.fs == d.fs_in
        # the toggles quantize to source-read boundaries, which lead
        # processing by one prefetched block — so 3 blocks +-1
        assert 3 * d.in_block <= len(x) <= 4 * d.in_block
        assert a.ex.raw_writer is None
    finally:
        a.stop_services()


def test_webview_channelizer_tune_and_frame():
    """The viewer against a ChannelizerBank: tuning maps the clicked RF
    frequency to (nearest channel, fine offset); the frame carries one
    row per channel."""
    args = app_mod.build_parser().parse_args(
        ["--channelize", "8", "--fs", "0.768", "--fc", "100.0",
         "--block", "4096", "--web", "0", "--psd-every", "1"])
    a = app_mod.App(args)
    a.start_services()
    try:
        p = a.web.port
        a.ex.run(n_blocks=2)
        fr = json.loads(_get(p, "/frame.json"))
        assert fr["ok"] and fr["n_rx"] == 8 and len(fr["rx"]) == 8
        # channel centers are fc + fftfreq: channel 1 sits at +96 kHz
        target = 100e6 + 96e3 + 5e3
        _get(p, f"/tune?f={target:.0f}")
        a.ex._apply_pending()
        ch = a.bank.channel_of(target)
        assert abs(a.bank._ch_cfgs[ch].fine_offset_hz - 5e3) < 1.0
    finally:
        a.stop_services()


def test_webview_bb_section():
    """--bb surfaces the selected RX's baseband waterfall in the viewer
    frame (reference BB plot window, gui.py:121-221)."""
    a = _mk_app(["--bb"])
    try:
        a.ex.run(n_blocks=6)
        fr = json.loads(_get(a.web.port, "/frame.json"))
        assert fr["ok"] and "bb" in fr, list(fr)
        assert fr["bb"]["rows"] >= 1 and fr["bb"]["cols"] > 64
        wf = np.frombuffer(base64.b64decode(fr["bb"]["wf_b64"]), np.uint8)
        assert wf.size == fr["bb"]["rows"] * fr["bb"]["cols"]
    finally:
        a.stop_services()


def test_webview_rig_pane_rigctld_loopback():
    """VERDICT r3 #5: the rig-control pane (reference RIG_CONTROL tab,
    rig_control.py:45-366) drives a rigctld over HTTP. Loopback: our own
    HamlibServer plays rigctld; every pane op crosses HTTP -> rigctl TCP
    -> RigState and lands in the bank / rig levels."""
    from pysdr_tpu.runtime import hamlib, rig

    a = _mk_app()
    srv = hamlib.HamlibServer(a.ex, 0, port=0).start()
    rc = rig.RigConnection(port=srv.server.server_address[1])
    a.web.rig = rc
    try:
        p = a.web.port
        st = json.loads(_get(p, "/rig.json"))
        assert st["active"] and "20m" in st["bands"]
        _get(p, "/rig?op=freq&v=14074000")
        _get(p, "/rig?op=mode&v=USB")
        _get(p, "/rig?op=rit&v=120")
        _get(p, "/rig?op=tx_pwr&v=0.8")
        _get(p, "/rig?op=mic_gain&v=0.35")
        _get(p, "/rig?op=monitor&v=0.2")
        _get(p, "/rig?op=ant&v=1")
        a.ex._apply_pending()
        rs = srv.server.rig
        assert a.bank._rx_cfgs[0].fc_hz == 14074000.0 + 120.0
        assert a.bank._rx_cfgs[0].mode == Mode.USB
        assert rs.levels["RFPOWER"] == 0.8
        assert rs.levels["MICGAIN"] == 0.35
        assert rs.levels["MONITOR_GAIN"] == 0.2
        assert rs.ant == 1
        st = json.loads(_get(p, "/rig.json"))
        assert st["freq"] == 14074000.0 and st["rit"] == 120.0
        assert st["tx_pwr"] == 0.8 and st["ant"] == 1
        # sub-band jump: band select tunes the rig to the FT8 slot
        _get(p, "/rig?op=band&v=40m")
        a.ex._apply_pending()
        assert abs(a.bank._rx_cfgs[0].fc_hz - (7.074e6 + 120.0)) < 1.0
    finally:
        rc.close()
        srv.stop()
        a.stop_services()


def test_webview_device_pane():
    """VERDICT r3 #5: the device-settings pane (reference device panel,
    gui.py:229-379) reads and mutates the source device model through
    block-boundary posts."""
    a = _mk_app()
    try:
        p = a.web.port
        st = json.loads(_get(p, "/device.json"))
        assert st["ok"] and st["fs"] == 512e3
        assert st["gain_db"] == 0.0 and st["antenna"] == "RX"
        _get(p, "/device?gain=12&ppm=2.5&ant=B")
        a.ex._apply_pending()
        assert a.source.rf_gain_db == 12.0
        assert a.source.ppm == 2.5
        assert a.source.antenna == "B"
        st = json.loads(_get(p, "/device.json"))
        assert st["gain_db"] == 12.0 and st["ppm"] == 2.5 \
            and st["antenna"] == "B"
    finally:
        a.stop_services()


def test_webview_rig_follower_toggles():
    """The pan panel's follow-freq / follow-band / CLAR toggles
    (reference gui.py:521-598) drive the RigFollower over HTTP."""
    from pysdr_tpu.runtime import hamlib, rig

    a = _mk_app()
    srv = hamlib.HamlibServer(a.ex, 0, port=0).start()
    rc = rig.RigConnection(port=srv.server.server_address[1])
    fl = rig.RigFollower(a.ex, rc)
    a.web.rig, a.web.follower = rc, fl
    try:
        p = a.web.port
        st = json.loads(_get(p, "/rig.json"))
        assert st["follow_freq"] and st["follow_band"] and st["clar"]
        _get(p, "/rig?op=follow_freq&v=0")
        _get(p, "/rig?op=clar&v=0")
        assert fl.follow_freq is False
        assert fl.use_clarifier is False
        assert fl.follow_band is True
        st = json.loads(_get(p, "/rig.json"))
        assert st["follow_freq"] is False and st["clar"] is False
    finally:
        rc.close()
        srv.stop()
        a.stop_services()


def test_webview_page_js_id_consistency():
    """Static guard for the embedded page: every element id the script
    references must exist in the markup (the class of bug a browserless
    CI cannot catch at runtime)."""
    import re

    from pysdr_tpu.runtime.webview import PAGE

    defined = set(re.findall(r'id="([^"]+)"', PAGE))
    referenced = set(re.findall(r"getElementById\('([^']+)'\)", PAGE))
    # per-RX rows are built dynamically with numeric suffixes
    dynamic = {r for r in referenced
               if re.fullmatch(r"(f|m|vb|ab|g|sq|mu|lv|rx)\d*\+?i?", r)}
    missing = referenced - defined - dynamic
    assert not missing, f"script references undefined ids: {missing}"
    # and the handlers the panes depend on are present
    for frag in ("loadRig", "loadDev", "rigSet", "drawWF", "buildRows"):
        assert PAGE.count(frag) >= 2, frag     # defined + used


def test_webview_record_honors_save_iq_dtype(tmp_path):
    """ADVICE r3: viewer-initiated recordings must honor the CLI's
    --save-iq-dtype (previously always complex64, 2-4x larger)."""
    import glob

    a = _mk_app(["--save-iq-dtype", "int8"])
    try:
        p = a.web.port
        a.ex.run(n_blocks=2)
        _get(p, f"/record?iq=1&dir={tmp_path}")
        a.ex.run(n_blocks=4)
        _get(p, "/record?iq=0")
        a.ex.run(n_blocks=5)
        files = glob.glob(str(tmp_path / "raw_iq_*.dat"))
        assert len(files) == 1
        from pysdr_tpu.io import datfile
        x, hdr = datfile.read_dat(files[0])
        assert hdr.dtype == "int8"
        assert len(x) > 0 and np.iscomplexobj(x)
    finally:
        a.stop_services()


def test_bad_control_request_does_not_kill_executive():
    """Round-4 fix: an out-of-range rx in a hand-typed URL is clamped,
    and even a command that throws is swallowed by the executive's
    command loop instead of killing the DSP thread."""
    a = _mk_app()
    try:
        p = a.web.port
        _get(p, "/tune?rx=7&f=612345")          # clamped to rx 0
        _get(p, "/gain?rx=9&v=2.0")
        a.ex.post(lambda ex: (_ for _ in ()).throw(RuntimeError("boom")))
        a.ex.run(n_blocks=3)                    # survives all of it
        assert a.ex.n_blocks == 3
        assert a.bank._rx_cfgs[0].fc_hz == 612345.0
        assert a.bank._rx_cfgs[0].af_gain == 2.0
    finally:
        a.stop_services()
