"""IQ / baseband / demod recording and replay (.dat files).

Equivalent of the reference `fileio.sdr_fileio(name, 'r'|'w', P)` with
`.save_data/.read_data/.srate/.fc` (reference pySDR.py:117-123,
receiver.py:526,759-761,808-813): every pipeline stage can be recorded and
replayed through the full chain — the framework's integration-test oracle
(SURVEY.md §4.1). The reference's exact binary header lives in the unmounted
aa2il/libs repo (only hdr(1)=fs, hdr(4)=nchan are documented, sigs/iq.m:99-100
and names like raw_iq_YYYYMMDD_HHMMSS.dat, sigs/nfm.m:47-52); this module
defines a self-describing v1 container carrying the same information:

  magic b'PSDRTPU1' | u32 header_bytes | JSON header
  { fs, fc, nchan, dtype, tag, timestamp } | raw samples (little-endian)

Samples are interleaved complex64 by default (nchan channels interleaved
sample-major, like the reference's stereo packing). dtype may also be
"int16" / "int8" / "uint8": interleaved re,im pairs at 1/2 / 1/4 the
bytes — the CS16/CS8/CU8 formats real front-ends produce (reference
converts CS16 at receiver.py:614-617). Quantization convention matches
the C++ streamer (native/sdrio.cpp): int16/32768, int8/128,
(uint8-127.5)/127.5.
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct
import time

import numpy as np

MAGIC = b"PSDRTPU1"

# IQ-pair integer formats: (numpy dtype, full-scale divisor, offset)
_INT_IQ = {"int16": (np.int16, 32768.0, 0.0),
           "int8": (np.int8, 128.0, 0.0),
           "uint8": (np.uint8, 127.5, 127.5)}


def _quantize_iq(x: np.ndarray, dtype: str) -> np.ndarray:
    """complex -> interleaved integer re,im pairs (ADC convention:
    full scale |x| = 1.0, clipping beyond)."""
    dt, scale, off = _INT_IQ[dtype]
    pairs = np.stack([x.real, x.imag], -1).reshape(-1)
    lo, hi = (0, 255) if dtype == "uint8" else (-scale, scale - 1)
    return np.clip(np.rint(pairs * scale + off), lo, hi).astype(dt)


def _dequantize_iq(raw: np.ndarray, dtype: str) -> np.ndarray:
    """Interleaved integer pairs -> complex64."""
    dt, scale, off = _INT_IQ[dtype]
    f = (raw.astype(np.float32) - np.float32(off)) \
        * np.float32(1.0 / scale)
    f = f.reshape(-1, 2)
    return (f[:, 0] + 1j * f[:, 1]).astype(np.complex64)


def timestamped_name(tag: str, t: float | None = None) -> str:
    """raw_iq_YYYYMMDD_HHMMSS.dat style names (reference replay:13-70)."""
    lt = time.localtime(t if t is not None else time.time())
    return f"{tag}_{time.strftime('%Y%m%d_%H%M%S', lt)}.dat"


@dataclasses.dataclass
class DatHeader:
    fs: float
    fc: float = 0.0
    nchan: int = 1
    dtype: str = "complex64"
    tag: str = "raw_iq"
    timestamp: float = 0.0


class DatWriter:
    """Streaming writer. `save_data` mirrors sdr_fileio.save_data
    (reference receiver.py:759-761)."""

    def __init__(self, path: str, fs: float, fc: float = 0.0, nchan: int = 1,
                 dtype: str = "complex64", tag: str = "raw_iq"):
        self.header = DatHeader(fs=fs, fc=fc, nchan=nchan, dtype=dtype,
                                tag=tag, timestamp=time.time())
        self.path = path
        self._f = open(path, "wb")
        hdr = json.dumps(dataclasses.asdict(self.header)).encode()
        self._f.write(MAGIC + struct.pack("<I", len(hdr)) + hdr)
        self.nsamples = 0

    def save_data(self, x) -> int:
        x = np.asarray(x)
        n_in = x.size
        if self.header.nchan > 1 and x.ndim == 2:
            x = x.reshape(-1)  # interleave channel-last
        if self.header.dtype in _INT_IQ:
            if np.iscomplexobj(x):
                x = _quantize_iq(x, self.header.dtype)
            elif x.dtype == np.dtype(self.header.dtype):
                pass                 # already-quantized raw pairs
            elif np.issubdtype(x.dtype, np.floating):
                # packed float pairs and real audio quantize with the
                # same full-scale convention (a bare astype would
                # TRUNCATE [-1,1] floats to 0/±1 — near-silence — with
                # no warning)
                if x.ndim == 2 and x.shape[-1] == 2:
                    x = (x[..., 0] + 1j * x[..., 1]
                         ).astype(np.complex64)
                else:
                    x = x.astype(np.complex64)
                x = _quantize_iq(x, self.header.dtype)
            else:
                raise TypeError(
                    f"cannot write {x.dtype} samples into an "
                    f"{self.header.dtype} IQ container")
        else:
            x = x.astype(self.header.dtype, copy=False)
        self._f.write(x.tobytes())
        self.nsamples += n_in // self.header.nchan
        return n_in

    def close(self):
        self._f.close()


class DatReader:
    """Replay reader with start-seek — `-replay FILE [start_sec]`
    (reference params.py:55-56, utils.py:462-471)."""

    def __init__(self, path: str, start_sec: float = 0.0):
        self._f = open(path, "rb")
        magic = self._f.read(8)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a pysdr-tpu .dat file")
        (hlen,) = struct.unpack("<I", self._f.read(4))
        self.header = DatHeader(**json.loads(self._f.read(hlen)))
        self._data_start = self._f.tell()
        self._iq_pairs = self.header.dtype in _INT_IQ
        per = 2 if self._iq_pairs else 1   # int formats store re,im pairs
        self._isize = (np.dtype(self.header.dtype).itemsize * per
                       * self.header.nchan)
        end = os.fstat(self._f.fileno()).st_size
        self.nsamples = (end - self._data_start) // self._isize
        if start_sec > 0:
            self.seek_seconds(start_sec)

    # reference-compatible attribute names (receiver.py:810-813)
    @property
    def srate(self) -> float:
        return self.header.fs

    @property
    def fc(self) -> float:
        return self.header.fc

    def seek_seconds(self, t: float):
        n = int(t * self.header.fs)
        self._f.seek(self._data_start + n * self._isize)

    def read_data(self, n: int | None = None, loop: bool = False):
        """Read n frames (None = rest of file). loop=True wraps around for
        endless benchmarking replay. Returns (n, nchan) or (n,) array."""
        if n is None:
            raw = self._f.read()
        else:
            raw = self._f.read(n * self._isize)
            while loop and len(raw) < n * self._isize:
                self._f.seek(self._data_start)
                got = self._f.read(n * self._isize - len(raw))
                if not got:
                    break        # header-only file: don't spin forever
                raw += got
        x = np.frombuffer(raw, dtype=self.header.dtype)
        if self._iq_pairs:
            x = _dequantize_iq(x, self.header.dtype)
        if self.header.nchan > 1:
            x = x.reshape(-1, self.header.nchan)
        return x

    def close(self):
        self._f.close()


def write_dat(path: str, x, fs: float, fc: float = 0.0, tag: str = "raw_iq"):
    x = np.asarray(x)
    nchan = 1 if x.ndim == 1 else x.shape[1]
    w = DatWriter(path, fs=fs, fc=fc, nchan=nchan, dtype=str(x.dtype),
                  tag=tag)
    w.save_data(x)
    w.close()


def read_dat(path: str):
    r = DatReader(path)
    x = r.read_data()
    r.close()
    return x, r.header
