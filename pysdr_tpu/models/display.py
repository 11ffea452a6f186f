"""Headless three-box display pipeline: time pane + PSD + waterfall.

Functional equivalent of the reference's `three_box_plot` visualization
stack (reference Plotting.py:312-753) with the Qt/pyqtgraph rendering
replaced by a headless, device-computed pipeline:

  * PSD via the on-device periodogram (reference Plotting.py:462);
  * rolling waterfall held ON DEVICE as a (rows, nfft) array
    (reference keeps (NFFT, 100) via concat, Plotting.py:543);
  * retune realignment `shift_waterfall` (Plotting.py:688-695);
  * median background + peak picking for pan-adaptor markers
    (Plotting.py:583-600);
  * pan-direction windowing Up / Down / Up-Down (Plotting.py:515-531);
  * dynamic-range clamp `max(zz, zmax - PAN_DR)` (Plotting.py:618-626);
  * bandmap spot overlay (`addSpot`/`removeAllSpots`, Plotting.py:634-686)
    as a host-side list with frequency snapping for click-to-tune
    (gui.py:1769-1896);
  * colormap LUT rendering (the imager path, Plotting.py:53-62,115-276;
    LUT tables: reference Tables.py:144-159) and a dependency-free PNG
    writer for waterfall export.

Only the final uint8 image + peak list cross the device boundary; one
`update()` per display tick is one compiled step.
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from typing import NamedTuple

import numpy as np

from pysdr_tpu.ops import cplx, spectrum


# --------------------------------------------------------------------------
# Spots (bandmap overlay)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class Spot:
    """One bandmap spot (reference Plotting.py SPOT / udp.py:30-211)."""
    freq_hz: float
    label: str
    color: str = "yellow"
    mode: str = ""


class SpotList:
    """Host-side spot overlay: add/remove/recolor/snap.

    Reference behavior: spots arrive over UDP (`NEW_SPOT_LIST`,
    udp.py:96-170), are drawn as TextItems (`addSpot`, Plotting.py:634-675),
    recolored on LOG messages (udp.py:171-189), and mouse clicks snap to the
    nearest spot within a tolerance (gui.py:1797-1830).
    """

    def __init__(self):
        self._spots: list[Spot] = []

    def add(self, freq_hz: float, label: str, color: str = "yellow",
            mode: str = "") -> Spot:
        s = Spot(freq_hz, label, color, mode)
        self._spots.append(s)
        return s

    def remove_all(self):
        self._spots.clear()

    def replace_all(self, spots):
        self._spots = list(spots)

    def recolor(self, label: str, color: str) -> int:
        """Recolor every spot with this label (the worked-station path,
        reference udp.py:171-189). Returns the number recolored."""
        n = 0
        for s in self._spots:
            if s.label == label:
                s.color = color
                n += 1
        return n

    def snap(self, freq_hz: float, max_dist_hz: float) -> Spot | None:
        """Nearest spot within max_dist_hz, or None (click-to-tune snapping,
        reference gui.py:1797-1830)."""
        best, bd = None, max_dist_hz
        for s in self._spots:
            d = abs(s.freq_hz - freq_hz)
            if d <= bd:
                best, bd = s, d
        return best

    def in_span(self, f_lo: float, f_hi: float) -> list[Spot]:
        return [s for s in self._spots if f_lo <= s.freq_hz <= f_hi]

    def __len__(self):
        return len(self._spots)

    def __iter__(self):
        return iter(self._spots)


# --------------------------------------------------------------------------
# Three-box pipeline
# --------------------------------------------------------------------------

class DisplayFrame(NamedTuple):
    """One display tick's host-side products."""
    time_y: np.ndarray        # (time_pts,) float32 |x| envelope samples
    freqs_hz: np.ndarray      # (nbins,) displayed frequency axis
    psd_db: np.ndarray        # (nbins,) newest PSD row (dB)
    waterfall_u8: np.ndarray  # (rows, nbins) uint8
    peak_freqs_hz: np.ndarray  # (k,) peak frequencies
    peak_vals_db: np.ndarray   # (k,)
    background_db: float


@dataclasses.dataclass
class DisplayConfig:
    fs: float
    fc_hz: float = 0.0
    nfft: int = 1024
    rows: int = 100            # waterfall depth (reference Plotting.py:543)
    pan_dr_db: float = 60.0    # dynamic range clamp (PAN_DR)
    pan_dir: str = "updown"    # 'up' | 'down' | 'updown' (Plotting.py:515)
    use_peaks: bool = True
    peak_dist_bins: int = 8    # min peak spacing (Plotting.py:596)
    peak_height_db: float = 6.0  # above median background
    time_pts: int = 256
    window: str = "hann"


class ThreeBox:
    """One domain's (RF / BB / AF) display state machine.

    update(x_block) runs the compiled PSD + waterfall step on device and
    returns a host DisplayFrame; retune(fc) realigns the waterfall.
    """

    def __init__(self, cfg: DisplayConfig, tag: str = ""):
        import jax
        import jax.numpy as jnp
        self._jnp = jnp
        self.cfg = cfg
        self.tag = tag
        self.spots = SpotList()
        self.design = spectrum.SpectrumDesign(
            fs=cfg.fs, nfft=cfg.nfft, window=cfg.window)
        # HOST numpy (jit-closure constant policy, models/receiver.py):
        # device-resident closure constants risk lowering-time pulls
        self._window = np.asarray(self.design.window_array())
        self.fc_hz = cfg.fc_hz
        self._wf = jnp.full((cfg.rows, cfg.nfft), -200.0, jnp.float32)
        lo, hi = self._pan_slice()
        self._lo, self._hi = lo, hi
        self._step = jax.jit(self._step_impl)

    def _pan_slice(self) -> tuple[int, int]:
        """Displayed bin range for the pan direction (Plotting.py:515-531):
        Up keeps [fc, fc+fs/2), Down keeps (fc-fs/2, fc], Up-Down keeps all."""
        n = self.cfg.nfft
        if self.cfg.pan_dir == "up":
            return n // 2, n
        if self.cfg.pan_dir == "down":
            return 0, n // 2 + 1
        return 0, n

    @property
    def freqs_hz(self) -> np.ndarray:
        return self.design.freqs_hz(self.fc_hz)[self._lo:self._hi]

    def _step_impl(self, x_p, wf, height_db, dr_db):
        jnp = self._jnp
        x = cplx.unpack(x_p) if x_p.ndim == 2 else x_p.astype(jnp.complex64)
        row = spectrum.periodogram(
            x, self._window, nfft=self.cfg.nfft, hop=self.design.hop)
        wf = spectrum.waterfall_push(wf, row)
        bg = spectrum.background_median(row)
        view = wf[:, self._lo:self._hi]
        # dynamic range is TRACED so the pan-adaptor DR control
        # (reference gui.py:521-598) is a pure value swap, no recompile
        img = spectrum.to_image_u8(
            spectrum.clamp_dynamic_range(view, dr_db), dr_db)
        pidx, pval = spectrum.find_peaks(
            row[self._lo:self._hi], bg + height_db,
            min_dist=self.cfg.peak_dist_bins)
        # decimated |x| envelope for the time pane
        n = x.shape[0]
        step = max(1, n // self.cfg.time_pts)
        env = jnp.abs(x[: step * self.cfg.time_pts:step])
        return wf, row[self._lo:self._hi], img, pidx, pval, bg, env

    def update(self, x_block) -> DisplayFrame:
        """x_block: packed float32 (n, 2), complex64, or real float32."""
        jnp = self._jnp
        if isinstance(x_block, np.ndarray):
            if np.iscomplexobj(x_block):
                x_block = jnp.asarray(cplx.pack(x_block))
            else:
                x_block = jnp.asarray(x_block.astype(np.float32))
        self._wf, row, img, pidx, pval, bg, env = self._step(
            x_block, self._wf, jnp.float32(self.cfg.peak_height_db),
            jnp.float32(self.cfg.pan_dr_db))
        pidx = np.asarray(pidx)
        pval = np.asarray(pval)
        ok = pidx >= 0
        if not self.cfg.use_peaks:
            ok[:] = False
        freqs = self.freqs_hz
        return DisplayFrame(
            time_y=np.asarray(env),
            freqs_hz=freqs,
            psd_db=np.asarray(row),
            waterfall_u8=np.asarray(img),
            peak_freqs_hz=freqs[pidx[ok]],
            peak_vals_db=pval[ok],
            background_db=float(np.asarray(bg)),
        )

    def retune(self, new_fc_hz: float):
        """Keep history aligned on retune (shift_waterfall,
        Plotting.py:688-695)."""
        df = self.design.fs / self.cfg.nfft
        bins = int(round((new_fc_hz - self.fc_hz) / df))
        if bins:
            self._wf = spectrum.waterfall_shift(
                self._wf, self._jnp.int32(-bins))
        self.fc_hz = new_fc_hz

    def clear(self):
        self._wf = self._jnp.full_like(self._wf, -200.0)


# --------------------------------------------------------------------------
# Colormaps + rendering (the imager/LUT path)
# --------------------------------------------------------------------------

def _lerp_map(anchors) -> np.ndarray:
    """(pos, r, g, b) anchors in [0,1] -> (256, 3) uint8 LUT."""
    a = np.asarray(anchors, np.float64)
    x = np.linspace(0.0, 1.0, 256)
    lut = np.stack([np.interp(x, a[:, 0], a[:, 1 + c]) for c in range(3)],
                   axis=1)
    return np.clip(lut * 255.0, 0, 255).astype(np.uint8)


_COLORMAPS = {
    # Matlab-style maps the reference ships as uint8 LUTs (Tables.py:144-159)
    "jet": [(0, 0, 0, .5), (.125, 0, 0, 1), (.375, 0, 1, 1),
            (.625, 1, 1, 0), (.875, 1, 0, 0), (1, .5, 0, 0)],
    "hot": [(0, 0, 0, 0), (.375, 1, 0, 0), (.75, 1, 1, 0), (1, 1, 1, 1)],
    "gray": [(0, 0, 0, 0), (1, 1, 1, 1)],
    "bone": [(0, 0, 0, 0), (.375, .32, .32, .44), (.75, .66, .78, .78),
             (1, 1, 1, 1)],
    "cool": [(0, 0, 1, 1), (1, 1, 0, 1)],
    "copper": [(0, 0, 0, 0), (.8, 1, .625, .4), (1, 1, .78, .5)],
    "spring": [(0, 1, 0, 1), (1, 1, 1, 0)],
    "summer": [(0, 0, .5, .4), (1, 1, 1, .4)],
    "autumn": [(0, 1, 0, 0), (1, 1, 1, 0)],
    "winter": [(0, 0, 0, 1), (1, 0, 1, .5)],
    "viridis": [(0, .267, .005, .329), (.25, .283, .141, .458),
                (.5, .128, .567, .551), (.75, .369, .789, .383),
                (1, .993, .906, .144)],
}


def colormap_lut(name: str) -> np.ndarray:
    """(256, 3) uint8 LUT by name (reference colormap tables,
    Tables.py:144-159; LUT builder Plotting.py:53-62)."""
    return _lerp_map(_COLORMAPS[name])


def colormap_names() -> list[str]:
    return sorted(_COLORMAPS)


def render_rgb(img_u8: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """uint8 grayscale (rows, cols) -> RGB (rows, cols, 3) via LUT — the
    pg.ImageItem+LUT equivalent (reference Plotting.py:177-250)."""
    return lut[np.asarray(img_u8)]


def write_png(path: str, rgb: np.ndarray):
    """Minimal dependency-free PNG writer (8-bit RGB) for headless
    waterfall export."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=-1)
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


# --------------------------------------------------------------------------
# Display engine: the UpdatePSD driver
# --------------------------------------------------------------------------

class DisplayEngine:
    """Headless equivalent of the GUI's 20 Hz UpdatePSD timer loop
    (reference pySDR.py:252-256, gui.py:1222-1398): owns one ThreeBox per
    domain (RF + per-RX AF/BB), consumes blocks from the executive's PSD
    tap, and rate-limits updates to every `decimate`-th block.
    """

    def __init__(self, bank, rf_cfg: DisplayConfig | None = None,
                 af_cfg: DisplayConfig | None = None, decimate: int = 1,
                 show_baseband: bool = False, max_af: int = 8):
        d = bank.design
        self.bank = bank
        self.decimate = max(1, decimate)
        rxs = getattr(bank.cfg, "receivers", None)
        if rxs:
            # the RF pane shows the DEVICE passband: its center is the
            # tuner frequency fc0 - foffset, NOT the main dial (labeling
            # it at the dial shifted every peak/spot/click by foffset —
            # caught round 4 by checking a peak against its station)
            fc0 = rxs[0].fc_hz - getattr(bank.cfg, "foffset_hz", 0.0)
        else:
            fc0 = getattr(bank.cfg, "fc_hz", 0.0)
        rf_cfg = rf_cfg or DisplayConfig(fs=d.fs_in, fc_hz=fc0)
        af_cfg = af_cfg or DisplayConfig(fs=d.fs_out, nfft=512,
                                         pan_dir="up")
        self.rf = ThreeBox(rf_cfg, tag="RF")
        # cap AF boxes: a 64-channel channelizer doesn't need 64 panes
        n_af = min(bank.n_rx, max_af)
        self.af = [ThreeBox(dataclasses.replace(af_cfg), tag=f"AF{i}")
                   for i in range(n_af)]
        self.bb = [ThreeBox(DisplayConfig(fs=d.fs_out,
                                          fc_hz=rxs[i].fc_hz if rxs
                                          else fc0),
                            tag=f"BB{i}")
                   for i in range(n_af)] if show_baseband else []
        self.frames: dict[str, DisplayFrame] = {}
        self._n = 0

    def __call__(self, executive, audio):
        """Executive psd_callback signature (runtime/executive.py)."""
        self._n += 1
        if self._n % self.decimate:
            return
        # audio: host complex64 (n_rx, out_block)
        for i, box in enumerate(self.af):
            self.frames[box.tag] = box.update(
                np.ascontiguousarray(audio[i]))

    def wants_next_bb(self) -> bool:
        """True when the NEXT __call__/update_bb pair will consume a
        baseband block — callers use this to skip the device->host
        baseband pull on blocks the decimation would discard (the phase
        arithmetic lives here, next to the counter it depends on)."""
        return bool(self.bb) and (self._n + 1) % self.decimate == 0

    def update_bb(self, bb):
        """Feed the per-RX BASEBAND boxes (the reference's BB domain of
        the three RF/BB/AF plot windows, gui.py:121-221, with its
        show-BB-PSD toggle): bb is host complex64 (n_rx, out_block) of
        post-mix/decimate baseband — the bank's emit_baseband tap. Uses
        the same decimation phase as the AF update."""
        if not self.bb or self._n % self.decimate:
            return
        for i, box in enumerate(self.bb):
            self.frames[box.tag] = box.update(
                np.ascontiguousarray(bb[i]))

    def update_rf(self, x_block) -> DisplayFrame:
        fr = self.rf.update(x_block)
        self.frames["RF"] = fr
        return fr

    def retune(self, fc_hz: float):
        self.rf.retune(fc_hz)

    def export_png(self, path: str, domain: str = "RF",
                   colormap: str = "viridis"):
        fr = self.frames[domain]
        write_png(path, render_rgb(fr.waterfall_u8, colormap_lut(colormap)))
        return path
