"""Real-TPU end-to-end smoke test: the full app (executive -> demod ->
device->host audio pull -> wav + PSD) must run on the actual chip.

Guards against the round-1 regression class where eager complex64 creation
UNIMPLEMENTED-poisoned the device stream so every device->host transfer
failed (the reference's entire point is the hot loop delivering audio,
reference receiver.py:684-782).

Runs in a SUBPROCESS with the TPU platform (the tests/ conftest pins the
in-process backend to CPU); skipped unless PYSDR_TPU_SMOKE=1 is set (needs
the real chip; CI/driver sets it where hardware exists).
"""

import os
import subprocess
import sys
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PYSDR_TPU_SMOKE") != "1",
    reason="set PYSDR_TPU_SMOKE=1 to run the real-TPU smoke test")


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_tpu_end_to_end_audio(tmp_path):
    wav_prefix = str(tmp_path / "smoke")
    png_dir = str(tmp_path / "png")
    cmd = [sys.executable, "-m", "pysdr_tpu", "--blocks", "8",
           "--block", "16384", "--fs", "2.048", "--wav", wav_prefix,
           "--psd", "--png-dir", png_dir]
    out = subprocess.run(cmd, env=_clean_env(), capture_output=True,
                         text=True, timeout=560,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr[-2000:]

    with wave.open(wav_prefix + "_rx0.wav") as w:
        fr = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        data = data.reshape(-1, w.getnchannels())[:, 0].astype(np.float32)
    assert len(data) >= 8 * 16384 // 2
    # the default synth source carries a 400 Hz AM tone on RX0
    seg = data[len(data) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1.0 / fr)
    peak_hz = f[5 + np.argmax(sp[5:])]
    assert abs(peak_hz - 400.0) < 5.0, peak_hz
    assert os.path.exists(os.path.join(png_dir, "RF.png"))
