import numpy as np
import pytest

from pysdr_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_ring_roundtrip(rng):
    r = native.NativeRing("t", 4096)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)
         ).astype(np.complex64)
    assert r.push(x) == 1000
    assert r.nsamps == 1000
    y = r.pull(1000)
    np.testing.assert_array_equal(x, y)


def test_native_ring_wrap(rng):
    r = native.NativeRing("t", 256)
    for _ in range(10):
        x = (rng.standard_normal(200) + 1j * rng.standard_normal(200)
             ).astype(np.complex64)
        assert r.push(x) == 200
        np.testing.assert_array_equal(r.pull(200), x)


def test_native_ring_overflow_drops_excess(rng):
    r = native.NativeRing("t", 128)
    x = np.arange(200, dtype=np.complex64)
    pushed = r.push(x)
    assert pushed == 128
    assert r.overflows == 72
    np.testing.assert_array_equal(r.pull(128), x[:128])


def test_native_streamer_complex64(tmp_path, rng):
    from pysdr_tpu.io import datfile
    x = (rng.standard_normal(50000) + 1j * rng.standard_normal(50000)
         ).astype(np.complex64)
    p = str(tmp_path / "s.dat")
    datfile.write_dat(p, x, fs=2.048e6, fc=7.1e6)
    s = native.NativeStreamer(p)
    assert s.srate == 2.048e6 and s.fc == 7.1e6
    a = s.read_data(20000)
    b = s.read_data(30000)
    np.testing.assert_array_equal(np.concatenate([a, b]), x)
    s.close()


def test_native_streamer_cs16(tmp_path, rng):
    from pysdr_tpu.io import datfile
    # int16 interleaved pairs written with dtype "int16", nchan=2 per the
    # container conventions (each complex sample = 2 int16)
    n = 10000
    raw = (rng.integers(-32768, 32767, size=2 * n)).astype(np.int16)
    w = datfile.DatWriter(str(tmp_path / "i16.dat"), fs=1e6, nchan=2,
                          dtype="int16", tag="raw_iq")
    w.save_data(raw)
    w.close()
    s = native.NativeStreamer(str(tmp_path / "i16.dat"))
    a = s.read_packed(n)
    expect = raw.astype(np.float32).reshape(n, 2) / 32768.0
    np.testing.assert_allclose(a, expect, atol=1e-6)
    s.close()


def test_native_streamer_loop(tmp_path, rng):
    from pysdr_tpu.io import datfile
    x = np.arange(1000, dtype=np.complex64)
    p = str(tmp_path / "l.dat")
    datfile.write_dat(p, x, fs=1e3)
    s = native.NativeStreamer(p, loop=True)
    a = s.read_data(2500)
    np.testing.assert_array_equal(a[:1000], x)
    np.testing.assert_array_equal(a[1000:2000], x)
    np.testing.assert_array_equal(a[2000:], x[:500])
    s.close()
