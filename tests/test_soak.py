"""Longevity soak: the reference's one documented perf bug is the
waterfall degrading after hours of streaming (reference
README.md:272-275, pull- vs push-model buffering). This soak runs the
full pipeline (display + PSD taps + recording off) for several hundred
blocks and pins the two ops-grade invariants: per-block time does not
drift upward, and RSS does not keep growing after warm-up."""

import os
import resource
import time

import numpy as np
import pytest

from pysdr_tpu import app as app_mod


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def test_soak_no_timing_drift_no_leak():
    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "2048", "--psd", "--psd-every", "4"])
    a = app_mod.App(args)
    ex = a.ex
    a.start_services()
    try:
        n_warm, n_run = 40, 360
        ex.run(n_blocks=n_warm)
        rss0 = _rss_mb()
        t0 = time.perf_counter()
        ex.run(n_blocks=n_warm + n_run // 2)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        ex.run(n_blocks=n_warm + n_run)
        t_second = time.perf_counter() - t0
        rss1 = _rss_mb()
    finally:
        a.stop_services()
    assert ex.n_blocks == n_warm + n_run
    # per-block time stable: the second half must not run >=1.5x slower
    # (the reference's degradation was monotonic growth)
    assert t_second < 1.5 * t_first + 0.25, (t_first, t_second)
    # memory flat after warm-up (ru_maxrss is a high-water mark, so any
    # increase means NEW peak allocations mid-soak; allow jit arenas)
    assert rss1 - rss0 < 200.0, (rss0, rss1)
    # waterfall frames exist and stayed bounded in size
    fr = a.display.frames.get("RF")
    assert fr is not None and fr.waterfall_u8.shape[0] <= 256


@pytest.mark.skipif("PYSDR_SOAK_MIN" not in os.environ,
                    reason="env-gated long soak: set PYSDR_SOAK_MIN=10 "
                           "(minutes) to run")
def test_soak_long_realtime_with_viewer(tmp_path):
    """The hours-scale soak (VERDICT r4 #6): the reference's one
    documented perf defect — the waterfall degrading 'after hours'
    (reference README.md:272-275) — only shows under sustained REALTIME
    streaming with a display consumer attached. This runs the paced
    pipeline for PYSDR_SOAK_MIN minutes with the web viewer polling
    frames and the mid-run record toggle cycling, and pins:
      * the stream finishes on schedule (no cumulative slowdown),
      * RSS is flat after the first quarter,
      * ZERO watchdog dead-man trips,
      * the viewer kept receiving frames the whole time.
    Run:  PYSDR_SOAK_MIN=10 python -m pytest tests/test_soak.py -q
    """
    import json
    import urllib.request

    from pysdr_tpu import app as app_mod

    minutes = float(os.environ["PYSDR_SOAK_MIN"])
    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--psd", "--psd-every", "2",
         "--web", "0", "--realtime", "--save-dir", str(tmp_path)])
    a = app_mod.App(args)
    a.start_services()
    d = a.bank.design
    block_s = d.out_block / d.fs_out
    n_total = int(minutes * 60.0 / block_s)
    port = a.web.port

    def get(path):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=10) as r:
            return r.read()

    try:
        t0 = time.monotonic()
        th = a.ex.run_in_thread(n_blocks=n_total)
        ok_frames = bad_frames = deadman_trips = 0
        rss_q1 = None
        rec_on = False
        last_rec = t0
        while th.is_alive():
            time.sleep(2.0)
            now = time.monotonic()
            try:
                fr = json.loads(get("/frame.json"))
                ok_frames += 1 if fr.get("ok") else 0
                bad_frames += 0 if fr.get("ok") else 1
            except Exception:
                bad_frames += 1
            # record toggle cycling (the GUI's save-raw toggle)
            if now - last_rec > 15.0:
                rec_on = not rec_on
                get(f"/record?iq={1 if rec_on else 0}")
                last_rec = now
            # dead-man discipline: after warm-up every watchdog must
            # have run a pass within 3 periods
            if now - t0 > 30.0:
                deadman_trips += sum(
                    0 if wd.alive() else 1 for wd in a.watchdogs)
            if rss_q1 is None and now - t0 > minutes * 15.0:
                rss_q1 = _rss_mb()
        th.join(timeout=60)
        wall = time.monotonic() - t0
        rss_end = _rss_mb()
    finally:
        get("/record?iq=0")
        a.stop_services()
        a.ex.stop()

    nominal = n_total * block_s
    assert a.ex.n_blocks == n_total
    # paced stream finished on schedule: cumulative slowdown shows up
    # as wall >> nominal (the reference bug class)
    assert wall < 1.2 * nominal + 15.0, (wall, nominal)
    # flat memory after the first quarter
    assert rss_q1 is not None and rss_end - rss_q1 < 150.0, \
        (rss_q1, rss_end)
    assert deadman_trips == 0
    # the viewer saw live frames essentially the whole run
    assert ok_frames > 0.9 * (ok_frames + bad_frames), \
        (ok_frames, bad_frames)
    # the record cycling actually wrote captures
    recs = list(tmp_path.glob("raw_iq_*.dat"))
    assert recs and all(p.stat().st_size > 0 for p in recs)
