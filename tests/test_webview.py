"""Live web viewer: waterfall frames over HTTP + click-to-tune posting
through the executive while it streams (the reference's interactive loop,
gui.py:1222-1398/1900-2038, without Qt)."""

import json
import time
import urllib.request

from pysdr_tpu import app as app_mod


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.read()


def test_webview_live_tune():
    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--web", "0",
         "--psd-every", "1"])
    a = app_mod.App(args)
    a.start_services()
    try:
        port = a.web.port
        # page serves
        page = _get(port, "/")
        assert b"pysdr_tpu" in page and b"canvas" in page
        # no frame yet
        assert json.loads(_get(port, "/frame.json"))["ok"] is False
        th = a.ex.run_in_thread(n_blocks=20)
        # frames appear while streaming
        fr = {"ok": False}
        deadline = time.monotonic() + 120
        while not fr["ok"] and time.monotonic() < deadline:
            time.sleep(0.2)
            fr = json.loads(_get(port, "/frame.json"))
        assert fr["ok"], "no display frame while streaming"
        assert fr["fc"] == 0.6e6
        assert len(fr["psd"]) > 100
        assert len(fr["wf"]) > 10
        assert fr["f0"] < fr["fc"] < fr["f1"]
        # click-to-tune: posts a retune applied at a block boundary
        _get(port, "/tune?f=612345")
        _get(port, "/mode?m=NFM")
        th.join(timeout=120)
        assert not th.is_alive()
        a.ex._apply_pending()   # in case the run ended before the post
        assert a.bank._rx_cfgs[0].fc_hz == 612345.0
        from pysdr_tpu.tables import Mode
        assert a.bank._rx_cfgs[0].mode == Mode.NFM
    finally:
        a.stop_services()
        a.ex.stop()


def test_webview_spot_snap():
    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--web", "0"])
    a = app_mod.App(args)
    a.start_services()
    try:
        a.display.rf.spots.add(601500.0, "W1AW")
        _get(a.web.port, "/tune?f=601300")   # within 2 kHz -> snaps
        a.ex._apply_pending()
        assert a.bank._rx_cfgs[0].fc_hz == 601500.0
    finally:
        a.stop_services()
