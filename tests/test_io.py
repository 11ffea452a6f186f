import numpy as np

from pysdr_tpu.io import datfile, synth, wav


def test_dat_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
         ).astype(np.complex64)
    p = str(tmp_path / "raw_iq_test.dat")
    datfile.write_dat(p, x, fs=2.048e6, fc=100e6)
    y, hdr = datfile.read_dat(p)
    assert hdr.fs == 2.048e6 and hdr.fc == 100e6
    np.testing.assert_array_equal(x, y)


def test_dat_chunked_read_and_seek(tmp_path, rng):
    fs = 1000.0
    x = np.arange(3000, dtype=np.complex64)
    p = str(tmp_path / "x.dat")
    datfile.write_dat(p, x, fs=fs)
    r = datfile.DatReader(p, start_sec=1.0)
    assert r.srate == fs
    a = r.read_data(500)
    np.testing.assert_array_equal(a, x[1000:1500])
    b = r.read_data(5000, loop=True)  # wraps
    assert len(b) == 5000
    np.testing.assert_array_equal(b[:1500], x[1500:])
    np.testing.assert_array_equal(b[1500:4500], x)


def test_wav_roundtrip(tmp_path):
    t = np.arange(4800) / 48e3
    a = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    wav.write_wav(p, a, 48e3)
    b, fs = wav.read_wav(p)
    assert fs == 48000
    np.testing.assert_allclose(b[:, 0], a, atol=1e-3)


def test_synth_am_spectrum():
    fs = 256e3
    src = synth.SynthSource(
        [synth.SignalSpec(offset_hz=50e3, mode="am", audio_hz=2e3)],
        fs=fs, noise_rms=0.0)
    x = src.read_data(65536)
    spec = np.abs(np.fft.fft(x))
    f = np.fft.fftfreq(len(x), 1 / fs)
    assert abs(f[np.argmax(spec)] - 50e3) < 10


def test_synth_phase_continuous():
    fs = 48e3
    src = synth.SynthSource([synth.SignalSpec(offset_hz=1e3, mode="tone")],
                            fs=fs)
    a = src.read_data(1000)
    b = src.read_data(1000)
    whole = synth.render([synth.SignalSpec(offset_hz=1e3, mode="tone")],
                         fs, 2000)
    np.testing.assert_allclose(np.concatenate([a, b]), whole, atol=1e-5)


def test_compact_int_iq_roundtrip(tmp_path):
    """CS16/CS8 .dat recordings: DatWriter quantizes complex IQ to
    interleaved integer pairs; both the Python reader and the C++
    streamer replay them with matching dequantization (the CS16 path the
    reference converts at receiver.py:614-617)."""
    import numpy as np
    from pysdr_tpu.io import datfile
    from pysdr_tpu.runtime import native

    rng = np.random.default_rng(5)
    n = 1 << 14
    x = (0.4 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    x = np.clip(x.real, -1, 1) + 1j * np.clip(x.imag, -1, 1)
    for dtype, snr_min in (("int16", 70.0), ("int8", 30.0)):
        path = str(tmp_path / f"iq_{dtype}.dat")
        w = datfile.DatWriter(path, fs=1e6, fc=7e6, dtype=dtype)
        w.save_data(x.astype(np.complex64))
        w.close()
        # file really is compact
        per = {"int16": 4, "int8": 2}[dtype]
        import os
        assert os.path.getsize(path) < n * per + 256
        rd = datfile.DatReader(path)
        assert rd.srate == 1e6 and rd.nsamples == n
        y = rd.read_data(n)
        err = x - y
        snr = 10 * np.log10(float(np.vdot(x, x).real)
                            / float(np.vdot(err, err).real))
        assert snr > snr_min, (dtype, snr)
        if native.available():
            ns = native.NativeStreamer(path)
            yp = ns.read_packed(n)
            yc = yp[:, 0] + 1j * yp[:, 1]
            np.testing.assert_allclose(yc, y, atol=1e-6)
            ns.close()
