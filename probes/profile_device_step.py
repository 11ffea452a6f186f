"""On-device step profiling (VERDICT r4 #1).

Captures a jax.profiler trace of the bank4 and chan64 compiled steps on
the REAL chip, parses the device plane of the Perfetto/Chrome trace the
profiler writes, and reports per-op device time, pipeline occupancy
(device busy time / wall), and achieved HBM GB/s from XLA's own
bytes-accessed cost analysis over the MEASURED device time — replacing
the r4 "hbm_util_lower >= 0.32" wall-clock hand-wave with trace-derived
numbers. Run from the repo root on the real chip:

    timeout 900 python probes/profile_device_step.py | tail -1

Findings land in PERF.md ("On-device step anatomy") and PROBES_r05.json.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402

ITERS = 30


def _parse_device_plane(trace_dir: str) -> dict:
    """Chrome-trace -> per-op totals for the /device:TPU:0 process."""
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    assert paths, f"no trace written under {trace_dir}"
    d = json.load(gzip.open(sorted(paths)[-1]))
    evs = d["traceEvents"]
    procs = {e["pid"]: e["args"]["name"] for e in evs
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in procs.items() if "device" in n.lower()}
    ops: dict = {}
    t_lo, t_hi, busy = None, None, 0.0
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name, dur = e["name"], float(e.get("dur", 0.0))
        # module-level events (jit_<fn>(...)) wrap the per-op rows on a
        # separate line; keep both, callers split them
        ops[name] = ops.get(name, 0.0) + dur
        ts = float(e.get("ts", 0.0))
        t_lo = ts if t_lo is None else min(t_lo, ts)
        t_hi = max(t_hi or 0.0, ts + dur)
        if not name.startswith("jit_"):
            busy += dur
    return {"ops_us": ops, "span_us": (t_hi - t_lo) if t_lo else 0.0,
            "busy_us": busy}


def _cost_analysis(fn, *args) -> dict:
    try:
        import jax
        lowered = jax.jit(fn).lower(*args)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {k: float(v) for k, v in ca.items()
                if isinstance(v, (int, float)) and (
                    "bytes" in k or "flops" in k or "transcendentals" in k)}
    except Exception as e:  # noqa: BLE001
        return {"error": repr(e)[:200]}


def _profile(tag: str, step, blocks, extra_cost_args=None) -> dict:
    import jax
    out = step(blocks[0])
    jax.block_until_ready(out)
    trace_dir = f"/tmp/jtrace_{tag}"
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for i in range(ITERS):
            out = step(blocks[i % len(blocks)])
        jax.block_until_ready(out)
    wall_s = time.perf_counter() - t0
    plane = _parse_device_plane(trace_dir)
    module = {n: us for n, us in plane["ops_us"].items()
              if n.startswith("jit_")}
    per_op = {n: us for n, us in plane["ops_us"].items()
              if not n.startswith("jit_")}
    dev_total_us = sum(module.values()) or plane["busy_us"]
    step_us = dev_total_us / ITERS
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:12]
    return {
        "iters": ITERS,
        "wall_ms_per_iter": wall_s / ITERS * 1e3,
        "device_step_us": round(step_us, 1),
        "device_busy_us_per_iter": round(plane["busy_us"] / ITERS, 1),
        "device_occupancy_of_wall": round(
            (dev_total_us / 1e6) / wall_s, 4),
        "top_ops_us_per_iter": {n: round(us / ITERS, 1)
                                for n, us in top},
        "top_ops_pct_of_step": {n: round(100.0 * us / dev_total_us, 1)
                                for n, us in top},
    }


def profile_bank4() -> dict:
    from pysdr_tpu.tables import Mode
    bank = bench._bank(8e6, [Mode.AM, Mode.NFM, Mode.USB, Mode.CW],
                       out_block=24576)
    d = bank.design
    blocks = bench._rand_blocks(d.in_block)
    res = _profile("bank4", bank.step_device, blocks)
    res["in_block"] = d.in_block
    ca = _cost_analysis(
        bank.step_functional, bank.state, blocks[0], bank.params)
    res["cost_analysis"] = ca
    if "bytes accessed" in ca and res["device_step_us"]:
        res["achieved_hbm_gbps"] = round(
            ca["bytes accessed"] / (res["device_step_us"] / 1e6) / 1e9, 1)
        res["achieved_tflops"] = round(
            ca.get("flops", 0.0)
            / (res["device_step_us"] / 1e6) / 1e12, 3)
        res["hbm_util_vs_819"] = round(
            res["achieved_hbm_gbps"] / 819.0, 3)
    res["sps_from_device_time"] = round(
        d.in_block / (res["device_step_us"] / 1e6), 0) \
        if res["device_step_us"] else None
    return res


def profile_chan64() -> dict:
    from pysdr_tpu.models.channelizer_bank import (ChannelizerBank,
                                                   ChannelizerBankConfig,
                                                   ChannelSettings)
    from pysdr_tpu.tables import Mode
    n = 64
    cfg = ChannelizerBankConfig(
        fs_in=n * 192e3, n_channels=n, fs_out=48e3, out_block=3072,
        fc_hz=100e6,
        channels=tuple(ChannelSettings(mode=Mode.AM) for _ in range(n)))
    cb = ChannelizerBank(cfg)
    blocks = bench._rand_blocks(cb.in_block)
    res = _profile("chan64", cb.step_device, blocks)
    res["in_block"] = cb.in_block
    ca = _cost_analysis(
        lambda s, x, p: cb._step(s, x, p), cb.state, blocks[0], cb.params)
    res["cost_analysis"] = ca
    if "bytes accessed" in ca and res["device_step_us"]:
        res["achieved_hbm_gbps"] = round(
            ca["bytes accessed"] / (res["device_step_us"] / 1e6) / 1e9, 1)
        res["achieved_tflops"] = round(
            ca.get("flops", 0.0)
            / (res["device_step_us"] / 1e6) / 1e12, 3)
        res["hbm_util_vs_819"] = round(
            res["achieved_hbm_gbps"] / 819.0, 3)
    res["sps_from_device_time"] = round(
        cb.in_block / (res["device_step_us"] / 1e6), 0) \
        if res["device_step_us"] else None
    return res


def profile_modes1ch() -> dict:
    """BASELINE configs 1-3 (one executable, mode as traced data): the
    1-RX device step at 2.048 MHz — completes trace coverage of every
    BASELINE config (bank4 = config 4, chan64 = config 5)."""
    from pysdr_tpu.tables import Mode
    bank = bench._bank(2.048e6, [Mode.AM], out_block=16384, spacing=0,
                       foffset=120e3)
    d = bank.design
    blocks = bench._rand_blocks(d.in_block)
    out = {}
    for name, mode, squelch in (("am", Mode.AM, -150.0),
                                ("nfm_squelch", Mode.NFM, 10.0),
                                ("ssb_agc", Mode.USB, -150.0)):
        bank.set_mode(0, mode)
        bank.set_squelch(0, squelch)
        res = _profile(f"modes_{name}", bank.step_device, blocks)
        res["in_block"] = d.in_block
        res["sps_from_device_time"] = round(
            d.in_block / (res["device_step_us"] / 1e6), 0) \
            if res["device_step_us"] else None
        out[name] = res
    return out


def main():
    out = {"bank4": profile_bank4()}
    print(f"# bank4: {json.dumps(out['bank4'])[:400]}",
          file=sys.stderr, flush=True)
    out["chan64"] = profile_chan64()
    print(f"# chan64: {json.dumps(out['chan64'])[:400]}",
          file=sys.stderr, flush=True)
    out["modes1ch"] = profile_modes1ch()
    print(f"# modes1ch: {json.dumps(out['modes1ch'])[:600]}",
          file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
