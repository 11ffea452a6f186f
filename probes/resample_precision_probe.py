"""Round-5 follow-up: kill the bf16 operand-prep passes in the bank4 step.

The postfix trace (results_r05/device_profile_postfix.json) showed ~83%
of the 5.95 ms bank4 device step spent PREPARING the slab-matmul
operands, not computing: TPU DEFAULT matmul precision downcasts the f32
LHS to bf16, which XLA lowers to two ~1.23 ms `while` conversion loops
over the (4, 8196, 500) slab buffers plus dynamic-slice/update-slice
assembly (~2.5 ms more). The matmuls themselves (N=3!) are noise.

This probe compiles the SAME step under matmul-precision variants and
profiles each on the real chip:

  default   — r5 baseline (bf16 passes, conversion whiles)
  float32   — HIGHEST: true f32 matmul, no downcast pass
  bf16-cast — explicit .astype(bfloat16) on the slab LHS so the cast
              fuses into the producer (accuracy measured separately)

Run:  timeout 1200 python probes/resample_precision_probe.py | tail -1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402

ITERS = 20


def _time_step(tag, precision):
    import jax
    from pysdr_tpu.tables import Mode
    bank = bench._bank(8e6, [Mode.AM, Mode.NFM, Mode.USB, Mode.CW],
                       out_block=24576)
    blocks = bench._rand_blocks(bank.design.in_block)
    with jax.default_matmul_precision(precision):
        step = jax.jit(bank.step_functional)
        out = step(bank.state, blocks[0], bank.params)
        jax.block_until_ready(out)
        # enter the pull regime (PERF.md elision discovery)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times = []
        for rep in range(5):
            t0 = time.perf_counter()
            for i in range(ITERS):
                out = step(bank.state, blocks[i % len(blocks)],
                           bank.params)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / ITERS * 1e3)
        times.sort()
    return {"precision": precision,
            "wall_ms_per_iter_median": round(times[2], 2),
            "wall_ms_min": round(times[0], 2),
            "wall_ms_max": round(times[-1], 2)}


def main():
    out = {}
    for prec in ("default", "float32", "tensorfloat32"):
        try:
            out[prec] = _time_step(prec, prec)
        except Exception as e:  # noqa: BLE001
            out[prec] = {"error": repr(e)[:200]}
        print(f"# {prec}: {json.dumps(out[prec])}",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
