"""Longevity soak: the reference's one documented perf bug is the
waterfall degrading after hours of streaming (reference
README.md:272-275, pull- vs push-model buffering). This soak runs the
full pipeline (display + PSD taps + recording off) for several hundred
blocks and pins the two ops-grade invariants: per-block time does not
drift upward, and RSS does not keep growing after warm-up."""

import resource
import time

import numpy as np

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
