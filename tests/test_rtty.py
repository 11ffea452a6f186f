import numpy as np
import pytest

from pysdr_tpu.models import rtty


def make_design(fs=12000.0):
    return rtty.RTTYDesign(fs=fs)


def test_design_params_match_reference():
    # reference RTTY_Params (rtty.py:376-404): T=22 ms symbol, shift 170 Hz,
    # 4 samples/bit, NFFT = 2^ceil(log2(N))
    d = make_design(12000.0)
    assert abs(d.bit_len / d.fs - 1.0 / 45.45) < 1e-3
    assert d.nfft == 1 << int(np.ceil(np.log2(d.bit_len)))
    assert d.shift_bins >= 1


def test_templates_shape_and_structure():
    d = make_design()
    H = rtty.char_templates(d)
    assert H.shape == (32, d.frames_per_char)
    fpb = d.frames_per_bit
    # start bit is space(-1), stop bits mark(+1) for every symbol
    assert (H[:, :fpb] == -1).all()
    assert (H[:, -2 * fpb:] == 1).all()


def test_single_channel_decode():
    d = make_design()
    msg = "CQ CQ DE AA2IL"
    x = rtty.synthesize_rtty(msg, d, carrier_hz=1000.0)
    dec = rtty.RTTYDecoder(d)
    from pysdr_tpu.ops import cplx
    texts = dec.decode_block(cplx.pack(x))
    assert len(dec.channels) >= 1
    joined = "".join(texts)
    assert "CQ" in joined and "AA2IL" in joined, joined


def test_single_channel_decode_noisy():
    d = make_design()
    msg = "RYRYRY TEST 599"
    x = rtty.synthesize_rtty(msg, d, carrier_hz=-800.0, snr_db=20.0)
    dec = rtty.RTTYDecoder(d)
    from pysdr_tpu.ops import cplx
    texts = dec.decode_block(cplx.pack(x))
    joined = "".join(texts)
    assert "TEST" in joined, joined
    assert "599" in joined, joined  # FIGS shift works


def test_multi_channel_parallel_decode():
    d = make_design()
    msgs = {0: "HELLO ONE", 1: "WORLD TWO", 2: "THREE THREE"}
    carriers = [-2000.0, 500.0, 3000.0]
    xs = [rtty.synthesize_rtty(m, d, carrier_hz=c)
          for m, c in zip(msgs.values(), carriers)]
    n = min(len(x) for x in xs)
    x = sum(x[:n] for x in xs)
    dec = rtty.RTTYDecoder(d)
    from pysdr_tpu.ops import cplx
    texts = dec.decode_block(cplx.pack(x.astype(np.complex64)))
    assert len(dec.channels) >= 3
    allt = "".join(t for t in texts)
    assert "HELLO" in allt and "WORLD" in allt and "THREE" in allt, allt


def test_streaming_decode_across_blocks():
    d = make_design()
    msg = "THE QUICK BROWN FOX"
    x = rtty.synthesize_rtty(msg, d, carrier_hz=1200.0)
    dec = rtty.RTTYDecoder(d)
    from pysdr_tpu.ops import cplx
    n4 = len(x) // 4
    out = ""
    for i in range(4):
        texts = dec.decode_block(cplx.pack(x[i * n4:(i + 1) * n4]))
        out += "".join(texts)
    assert "QUICK" in out and "FOX" in out, out
