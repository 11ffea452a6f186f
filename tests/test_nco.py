import numpy as np
import jax.numpy as jnp

from pysdr_tpu.ops import nco


def test_phase_indices_exact():
    k = nco.snap_freq(100e3, 2.048e6)
    n = 50000
    idx = np.asarray(nco.phase_indices(k, 1234, n))
    expect = (1234 + k * np.arange(n, dtype=np.int64)) % nco.DENOM
    np.testing.assert_array_equal(idx, expect)


def test_phase_indices_large_block_and_k():
    # worst case: k near DENOM, block crossing all decomposition levels
    k = nco.DENOM - 7
    n = (1 << 17) + 513
    idx = np.asarray(nco.phase_indices(k, nco.DENOM - 1, n))
    expect = ((nco.DENOM - 1) + k * np.arange(n, dtype=np.int64)) % nco.DENOM
    np.testing.assert_array_equal(idx, expect)


def test_advance_matches_indices():
    k = nco.snap_freq(-731e3, 8e6)
    p = 0
    for n in (256, 1000, 4096, 65536 + 3):
        p2 = int(nco.advance(k, p, n))
        assert p2 == (p + k * n) % nco.DENOM
        p = p2


def test_advance_superblock_totals():
    """Streaming processors pass whole super-block totals (n_stream*seg)
    to advance(); these exceed the 3-level split's old 2^24 bound. The
    mod-DENOM pre-reduction must keep it exact for arbitrary n
    (ADVICE r3: int32 overflow silently corrupted phase for n >= ~2^26)."""
    k = nco.DENOM - 7           # worst-case numerator
    p = 12345
    for n in (1 << 26, (1 << 28) + 999983, (1 << 31) + 17, 10**12 + 3):
        got = int(nco.advance(k, p, n))
        assert got == (p + k * n) % nco.DENOM, n


def test_mix_down_shifts_tone_to_dc():
    fs = 2.048e6
    f = 250e3
    k = nco.snap_freq(f, fs)
    f_snap = float(nco.snapped_freq_hz(k, fs))
    n = 65536
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * f_snap * t).astype(np.complex64)
    y, p1 = nco.mix_down(jnp.asarray(x), k, 0)
    y = np.asarray(y)
    # after downconversion the tone sits at DC: nearly constant phase
    assert np.abs(np.mean(y)) > 0.9999
    assert int(p1) == (k * n) % nco.DENOM


def test_mix_streaming_equals_batch():
    fs = 2e6
    k = nco.snap_freq(333e3, fs)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64)
    y_full, _ = nco.mix_down(jnp.asarray(x), k, 0)
    p = 0
    chunks = []
    for i in range(0, 8192, 1024):
        yc, p = nco.mix_down(jnp.asarray(x[i:i + 1024]), k, p)
        chunks.append(np.asarray(yc))
    # 5e-6 (-106 dB on unit signals): the factored-LO outer product adds
    # one complex rounding vs the per-sample form, and the chunked and
    # full paths pick different B factors (phase math itself stays
    # exact-integer; only the float phasor product differs)
    np.testing.assert_allclose(np.concatenate(chunks), np.asarray(y_full),
                               rtol=0, atol=5e-6)


def test_tone_unit_amplitude():
    z = np.asarray(nco.tone(nco.snap_freq(700.0, 48e3), 0, 4800))
    np.testing.assert_allclose(np.abs(z), 1.0, atol=1e-6)


def test_factored_lo_matches_direct_across_sizes():
    """The O(sqrt n) factored LO (outer product of two phasor tables)
    must match the per-sample cos/sin form to float rounding for every
    block-size class: B-divisible, odd (direct fallback), tiny, and
    non-power-of-two multiples."""
    fs = 2.048e6
    k = nco.snap_freq(123456.7, fs)
    for n in (7, 96, 1000, 4096, 12288, 4096000 // 500):
        got = np.asarray(nco.mix_down(jnp.ones(n, jnp.complex64), k, 5)[0])
        idx = (5 + k * np.arange(n, dtype=np.int64)) % nco.DENOM
        th = idx.astype(np.float64) * (2 * np.pi / nco.DENOM)
        want = np.exp(-1j * th)
        assert np.max(np.abs(got - want)) < 5e-6, n
        # phase advance stays exact-integer regardless of path
        assert int(nco.mix_down(jnp.ones(n, jnp.complex64), k, 5)[1]) \
            == (5 + k * n) % nco.DENOM
