"""Three-box display pipeline: PSD/waterfall/peaks/spots/render/export.

Covers the reference three_box_plot behaviors (Plotting.py:312-753):
tone appears at the right bin, waterfall rolls and realigns on retune,
pan-direction windowing, peak picking over median background, spot
snap/recolor, LUT rendering, PNG export.
"""

import os
import struct
import zlib

import numpy as np
import pytest

from pysdr_tpu.models import display
from tests.conftest import make_tone


def _box(fs=48e3, **kw):
    cfg = display.DisplayConfig(fs=fs, nfft=256, rows=16, **kw)
    return display.ThreeBox(cfg)


def test_tone_at_right_bin():
    fs = 48e3
    box = _box(fs)
    f0 = 6e3
    fr = box.update(make_tone(fs, f0, 4096))
    peak_f = fr.freqs_hz[np.argmax(fr.psd_db)]
    assert abs(peak_f - f0) < fs / 256
    assert fr.waterfall_u8.shape == (16, 256)
    assert fr.waterfall_u8[0].max() == 255      # newest row on top, clamped
    assert fr.time_y.shape[0] == 256
    np.testing.assert_allclose(fr.time_y, 1.0, atol=1e-3)  # unit tone env


def test_waterfall_rolls_and_clears():
    fs = 48e3
    box = _box(fs)
    fr1 = box.update(make_tone(fs, 1e3, 4096))
    fr2 = box.update(make_tone(fs, 1e3, 4096))
    # row 1 of the second frame equals row 0 of the first (rolled down)
    np.testing.assert_array_equal(fr2.waterfall_u8[1], fr1.waterfall_u8[0])
    box.clear()
    fr3 = box.update(np.zeros(4096, np.complex64))
    assert fr3.background_db < -150


def test_retune_shifts_history():
    fs = 48e3
    box = _box(fs)
    f0 = 6e3
    box.update(make_tone(fs, f0, 4096))
    bin_before = np.argmax(box.update(make_tone(fs, f0, 4096)).psd_db)
    df = fs / 256
    # retune +8 bins: the receiver recentres, so the SAME absolute-frequency
    # tone now lands 8 bins lower in baseband; history must follow.
    box.retune(8 * df)
    fr = box.update(make_tone(fs, f0 - 8 * df, 4096))
    assert np.argmax(fr.psd_db) == bin_before - 8
    # history rows were rolled to the same column as the new row
    assert np.argmax(fr.waterfall_u8[2].astype(int)) == bin_before - 8
    # absolute frequency axis: peak still maps to f0
    peak_f = fr.freqs_hz[np.argmax(fr.psd_db)]
    assert abs(peak_f - f0) < 2 * df


@pytest.mark.parametrize("pan_dir,expect", [
    ("up", (128, 256)), ("down", (0, 129)), ("updown", (0, 256))])
def test_pan_direction_window(pan_dir, expect):
    box = _box(pan_dir=pan_dir)
    lo, hi = box._pan_slice()
    assert (lo, hi) == expect
    fr = box.update(make_tone(48e3, 6e3, 4096))
    assert fr.psd_db.shape[0] == hi - lo
    assert fr.freqs_hz.shape[0] == hi - lo
    if pan_dir == "up":
        assert fr.freqs_hz.min() >= 0.0
    if pan_dir == "down":
        assert fr.freqs_hz.max() <= 0.0 + 1e-6


def test_peaks_over_background(rng):
    fs = 48e3
    box = _box(fs)
    x = (make_tone(fs, 5e3, 8192, amp=10.0)
         + make_tone(fs, -9e3, 8192, amp=8.0)
         + 0.1 * (rng.standard_normal(8192)
                  + 1j * rng.standard_normal(8192)).astype(np.complex64))
    fr = box.update(x.astype(np.complex64))
    assert len(fr.peak_freqs_hz) >= 2
    tops = sorted(fr.peak_freqs_hz[:2])
    assert abs(tops[1] - 5e3) < fs / 256 and abs(tops[0] + 9e3) < fs / 256


def test_spots_snap_and_recolor():
    sl = display.SpotList()
    sl.add(14.020e6, "W1AW", mode="CW")
    sl.add(14.025e6, "AA2IL")
    assert sl.snap(14.0215e6, max_dist_hz=2e3).label == "W1AW"
    assert sl.snap(14.1e6, max_dist_hz=2e3) is None
    assert sl.recolor("AA2IL", "red") == 1
    assert [s.color for s in sl] == ["yellow", "red"]
    assert len(sl.in_span(14.0e6, 14.021e6)) == 1
    sl.remove_all()
    assert len(sl) == 0


def test_render_and_png(tmp_path):
    img = np.arange(256, dtype=np.uint8)[None].repeat(8, 0)
    for name in display.colormap_names():
        lut = display.colormap_lut(name)
        assert lut.shape == (256, 3) and lut.dtype == np.uint8
    rgb = display.render_rgb(img, display.colormap_lut("jet"))
    assert rgb.shape == (8, 256, 3)
    p = str(tmp_path / "wf.png")
    display.write_png(p, rgb)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (256, 8)
    # IDAT decompresses to h*(1+w*3) filter-prefixed rows
    idat = raw[raw.index(b"IDAT") + 4:raw.rindex(b"IEND") - 8]
    assert len(zlib.decompress(idat)) == 8 * (1 + 256 * 3)


def test_display_engine_with_bank():
    from pysdr_tpu.config import PipelineConfig, ReceiverConfig
    from pysdr_tpu.models.receiver import ReceiverBank
    from pysdr_tpu.tables import Mode

    cfg = PipelineConfig(
        fs_in=256e3, fs_out=32e3, out_block=512, foffset_hz=32e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM),
                   ReceiverConfig(fc_hz=10.05e6, mode=Mode.USB)))
    bank = ReceiverBank(cfg)
    eng = display.DisplayEngine(bank, decimate=1)
    audio = np.zeros((2, 512), np.complex64)
    audio[0] = make_tone(32e3, 1e3, 512)
    eng(None, audio)
    assert "AF0" in eng.frames and "AF1" in eng.frames
    x = make_tone(256e3, 20e3, bank.design.in_block)
    eng.update_rf(x)
    p = eng.export_png("/tmp/_pysdr_wf_test.png", "RF")
    assert os.path.exists(p)
    os.unlink(p)


def test_rf_display_labels_absolute_station_frequency():
    """Round-4 fix: the RF pane is centered on the DEVICE passband
    (dial - foffset), not the dial — labeling it at the dial shifted
    every peak/spot/click-target by foffset. A synth station at the
    600 kHz dial must produce an RF peak labeled 600 kHz."""
    from pysdr_tpu import app as app_mod

    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--psd", "--psd-every", "1"])
    a = app_mod.App(args)
    a.ex.run(n_blocks=4)
    fr = a.display.frames["RF"]
    pk = np.asarray(fr.peak_freqs_hz)
    assert np.any(np.abs(pk - 600e3) < 2e3), pk
    # the axis center is the device tuner frequency
    ctr = fr.freqs_hz[len(fr.freqs_hz) // 2]
    assert abs(ctr - a.cfg.sdr_center_hz) < 2e3, ctr
