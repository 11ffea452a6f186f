"""Headline benchmark: IQ samples/s through the full mix+filter+demod chain.

Config: 4 independent receivers (AM/NFM/USB/CW) over an 8 MHz passband —
BASELINE.json config 4, the reference's maximum advertised configuration
(4 RXs over the SDRplay's ~8 MHz usable bandwidth at its 10 Msps ceiling,
/root/reference/README.md:27, Tables.py:45).

Prints ONE JSON line {metric, value, unit, vs_baseline}.
value       = RF input samples/s sustained through the whole 4-channel bank.
vs_baseline = value / 10 Msamp/s — the reference's real-time design
              envelope (it publishes no benchmark numbers; BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pysdr_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from pysdr_tpu.config import PipelineConfig, ReceiverConfig
    from pysdr_tpu.models.receiver import ReceiverBank
    from pysdr_tpu.tables import Mode

    fs_in = 8e6
    modes = [Mode.AM, Mode.NFM, Mode.USB, Mode.CW]
    fc0 = 100e6
    rxs = tuple(
        ReceiverConfig(fc_hz=fc0 + 500e3 * i, mode=modes[i % 4])
        for i in range(4))
    # out_block 24576 -> in_block = 8192*500 = 4.096 Msamples (~0.5 s RF)
    cfg = PipelineConfig(fs_in=fs_in, fs_out=48e3, out_block=24576,
                         foffset_hz=750e3, receivers=rxs)
    bank = ReceiverBank(cfg)
    d = bank.design

    key = jax.random.PRNGKey(0)
    n_bufs = 4
    # packed float32 re/im pairs (complex64 cannot cross the host/device
    # boundary on this backend — ops/cplx.py)
    blocks = [jax.device_put(jax.random.normal(
        jax.random.fold_in(key, i), (d.in_block, 2), jnp.float32))
        for i in range(n_bufs)]

    # warmup / compile
    audio = bank.step_device(blocks[0])
    audio.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        audio = bank.step_device(blocks[i % n_bufs])
    audio.block_until_ready()
    dt = time.perf_counter() - t0

    samples_per_s = d.in_block * iters / dt
    baseline = 10e6  # reference max real-time RF rate (BASELINE.md)
    print(json.dumps({
        "metric": "rf_samples_per_s_4ch_bank",
        "value": float(samples_per_s),
        "unit": "samples/s",
        "vs_baseline": float(samples_per_s / baseline),
    }))


if __name__ == "__main__":
    main()
