"""Replay-corpus regression tests: each committed capture in
tests/fixtures/ replays through the FULL app chain and must reproduce
its pinned outcome (the reference's annotated-captures discipline,
replay:23-75 / rtty:1-40 — formalized as assertions)."""

import os
import wave

import numpy as np

from pysdr_tpu import app as app_mod

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def run_app(argv):
    args = app_mod.build_parser().parse_args(argv)
    a = app_mod.App(args)
    a.run()
    return a


def _peak_hz(path):
    w = wave.open(path)
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels())[:, 0].astype(np.float32)
    seg = d[len(d) // 3:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    frq = np.fft.rfftfreq(len(seg), 1.0 / w.getframerate())
    pk = frq[5 + np.argmax(sp[5:])]
    floor = np.median(sp[5:]) + 1e-9
    return pk, 20 * np.log10(sp[5:].max() / floor)


def test_corpus_am_tones(tmp_path):
    prefix = str(tmp_path / "am")
    run_app(["--replay", os.path.join(FIX, "am_tones.dat"), "--no-loop",
             "--fc", "100.0", "100.04", "--mode", "AM",
             "--video-bw", "8", "--block", "4096", "--wav", prefix])
    pk0, snr0 = _peak_hz(prefix + "_rx0.wav")
    pk1, snr1 = _peak_hz(prefix + "_rx1.wav")
    assert abs(pk0 - 400.0) < 10.0, pk0
    assert abs(pk1 - 800.0) < 10.0, pk1
    assert snr0 > 40.0 and snr1 > 40.0, (snr0, snr1)


def test_corpus_rtty_cq():
    a = run_app(["--replay", os.path.join(FIX, "rtty_cq.dat"),
                 "--no-loop", "--fc", "100.0", "--mode", "RTTY",
                 "--block", "4096", "--rtty", "0"])
    text = "".join(a.rtty_text)
    assert "CQ" in text and "AA2IL" in text, text


def test_corpus_nfm_squelch_drop(tmp_path):
    prefix = str(tmp_path / "nfm")
    run_app(["--replay", os.path.join(FIX, "nfm_squelch_drop.dat"),
             "--no-loop", "--fc", "100.0", "--mode", "NFM",
             "--squelch", "6", "--block", "4096", "--wav", prefix])
    w = wave.open(prefix + "_rx0.wav")
    fr = w.getframerate()
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels())[:, 0].astype(np.float32)
    open_seg = d[int(0.4 * fr):int(1.0 * fr)]
    tail_seg = d[int(1.5 * fr):]
    assert len(tail_seg) > fr // 4
    sp = np.abs(np.fft.rfft(open_seg * np.hanning(len(open_seg))))
    pk = np.fft.rfftfreq(len(open_seg), 1.0 / fr)[5 + np.argmax(sp[5:])]
    assert abs(pk - 700.0) < 15.0, pk
    assert np.std(open_seg) > 10.0 * max(np.std(tail_seg), 1e-9)
