"""ReceiverBank pallas path vs pure-JAX path: identical audio streams."""

import numpy as np

from pysdr_tpu.config import PipelineConfig, ReceiverConfig
from pysdr_tpu.models.receiver import ReceiverBank
from pysdr_tpu.tables import Mode
from tests.conftest import make_tone


def test_bank_paths_agree(rng):
    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=768, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM),
                   ReceiverConfig(fc_hz=10.02e6, mode=Mode.USB),
                   ReceiverConfig(fc_hz=10.04e6, mode=Mode.NFM)))
    b_ref = ReceiverBank(cfg, use_pallas=False)
    b_pal = ReceiverBank(cfg, use_pallas=True)   # interpreted on CPU
    n = b_ref.design.in_block
    for blk in range(3):
        x = (make_tone(512e3, -55e3, n, amp=0.5, phase=blk)
             + 0.05 * (rng.standard_normal(n)
                       + 1j * rng.standard_normal(n))).astype(np.complex64)
        a = b_ref.step(x)
        b = b_pal.step(x)
        scale = max(np.abs(a).max(), 1e-9)
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-5,
                                   err_msg=f"block {blk}")
