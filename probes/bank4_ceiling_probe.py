"""bank4 e2e ceiling forensics (VERDICT r4 #2).

Why does `end_to_end_bank4` (4-RX over the reference's maximum 8 MHz
envelope, i8 RF wire + i16 audio return) deliver ~70% of its measured
transport ceiling while the 1-RX `i8_xl` config delivers ~100%?

This probe runs the EXACT bench configuration (bench._run_e2e) through
a grid of implementation levers — block size, audio wire, pipeline
depth, the (new) want_bb gate on the carried-baseband async copy — and
reports each variant's pct_of_ceiling against the same
transport-probe measurement the bench uses. Run from the repo root on
the real chip:

    timeout 1800 python probes/bank4_ceiling_probe.py | tail -1

Findings land in PERF.md (bank4 section) and the winning levers in
bench.py's bank4 e2e config.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    from pysdr_tpu.utils import prepay_transfer_tax

    out = {"first_pull_tax_s": round(
        prepay_transfer_tax(background=False) or 0.0, 1)}
    out["transport_mbps"] = round(bench._measure_transport_mbps(), 1)
    print(f"# transport: {out['transport_mbps']} MB/s",
          file=sys.stderr, flush=True)

    with tempfile.TemporaryDirectory() as td:
        path8 = os.path.join(td, "e2e8m.dat")
        bench._write_am_dat(path8, fs=8e6, n=1 << 23, offset_hz=750e3)
        base = ["--replay", path8, "--fs", "8.0",
                "--fc", "100.0", "100.5", "101.0", "101.5",
                "--modes", "AM", "NFM", "USB", "CW", "--wire", "i8"]
        variants = {
            # the committed r4 bench config
            "baseline_r4": base + ["--block", "24576",
                                   "--audio-wire", "i16"],
            # levers, one at a time
            "block2x": base + ["--block", "49152",
                               "--audio-wire", "i16"],
            "block4x": base + ["--block", "98304",
                               "--audio-wire", "i16"],
            "i8_audio": base + ["--block", "24576",
                                "--audio-wire", "i8"],
            "depth1": base + ["--block", "24576", "--audio-wire", "i16",
                              "--pipeline-depth", "1"],
            "depth4": base + ["--block", "24576", "--audio-wire", "i16",
                              "--pipeline-depth", "4"],
            # combined best-guess
            "block4x_i8_audio": base + ["--block", "98304",
                                        "--audio-wire", "i8"],
            # THE decisive lever (round 5): the source read-ahead
            # thread overlaps host read + quantize + device_put issue
            # with the in-flight transfers — it doubled this config
            # (10.9 -> 23.1 Msps, results_r05/bank4_prefetch_lever.json)
            "i8_audio_noprefetch": base + ["--block", "24576",
                                           "--audio-wire", "i8",
                                           "--no-prefetch"],
        }
        for name, argv in variants.items():
            nb = 12 if "4x" in name else 20
            try:
                r = bench._run_e2e(argv, n_blocks=nb)
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": repr(e)[:200]}
                continue
            bench._add_ceilings({name: r}, out["transport_mbps"])
            out[name] = r
            print(f"# {name}: {r['samples_per_s'] / 1e6:.2f} Msps "
                  f"({r.get('pct_of_ceiling')}% of ceiling) "
                  f"stage_ms={r['stage_ms']}",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
