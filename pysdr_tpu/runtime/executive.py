"""The streaming executive: source -> device -> ReceiverBank -> sinks.

Equivalent of the reference `SDR_EXECUTIVE.Run` hot loop (reference
receiver.py:684-782): per block it (1) reads an IQ chunk from the source,
(2) applies pending mode/freq changes at the block boundary
(mode_freq_change, receiver.py:633-680), (3) runs the demod bank,
(4) routes audio to sinks (audio_out, receiver.py:153-225), (5) taps
PSDs and recordings (receiver.py:747-761). Differences by design:

  * the DSP is one jitted device step, so the "loop" is a thin host
    pipeline: host reads block k+1 and converts it while the device
    computes block k (JAX async dispatch gives the overlap for free);
  * control mutations arrive through a thread-safe command queue and are
    applied between blocks as pure params swaps (no recompiles);
  * back-pressure: in realtime mode the loop paces to the audio clock and
    the watchdog keeps sink rings inside the watermarks; in throughput
    mode it free-runs (bench).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable

import numpy as np

from pysdr_tpu.ops import cplx
from pysdr_tpu.runtime.profiler import BlockProfiler
from pysdr_tpu.runtime.ringbuffer import RingBuffer


class Executive:
    def __init__(self, bank, source, audio_rings=None, realtime=False,
                 raw_writer=None, demod_writer=None,
                 psd_callback: Callable | None = None, loop_source=True):
        """bank: models.receiver.ReceiverBank; source: DatReader/SynthSource
        (anything with read_data(n)); audio_rings: list of RingBuffer per
        channel (created if None); raw/demod_writer: io.datfile.DatWriter
        taps (reference -save_iq/-save_demod, params.py:136-141)."""
        import jax.numpy as jnp
        self._jnp = jnp
        self.bank = bank
        self.source = source
        self.realtime = realtime
        self.loop_source = loop_source
        d = bank.design
        ring_size = 32 * 1024 * max(1, int(d.fs_out / 48e3))  # params.py:456
        self.audio_rings = audio_rings or [
            RingBuffer(f"audio{i}", ring_size, "complex64")
            for i in range(bank.n_rx)]
        self.raw_writer = raw_writer
        self.demod_writer = demod_writer
        self.psd_callback = psd_callback
        self.profiler = BlockProfiler(d.in_block, d.fs_in)
        self._cmd_q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self.n_blocks = 0
        self.last_rf_block: np.ndarray | None = None

    # ---- control plane: thread-safe, applied at block boundaries ----
    # (the service_commands RPC surface, reference receiver.py:301-399)

    def post(self, method: str, *args):
        self._cmd_q.put((method, args))

    def _apply_pending(self):
        while True:
            try:
                method, args = self._cmd_q.get_nowait()
            except queue.Empty:
                return
            getattr(self.bank, method)(*args)

    # ---- the hot loop ----

    def run(self, n_blocks: int | None = None, duration_s: float | None = None):
        jnp = self._jnp
        d = self.bank.design
        deadline = time.monotonic() + duration_s if duration_s else None
        block_budget = d.in_block / d.fs_in

        def read_block():
            # fast path: sources that yield float32 (n, 2) packed pairs
            # directly (the C++ NativeStreamer) skip all host complex math
            if hasattr(self.source, "read_packed"):
                xp = self.source.read_packed(d.in_block)
                if len(xp) < d.in_block:
                    return None
                x = xp.view(np.complex64).reshape(-1)
                if self.raw_writer is not None:
                    self.raw_writer.save_data(x)
                self.last_rf_block = x
                return jnp.asarray(xp)
            x = self.source.read_data(d.in_block, loop=self.loop_source) \
                if self.loop_source else self.source.read_data(d.in_block)
            x = np.asarray(x).reshape(-1)[:d.in_block]
            if len(x) < d.in_block:
                return None
            if self.raw_writer is not None:
                self.raw_writer.save_data(x)
            # RF tap for PSD/display consumers (reference rb_rf push,
            # receiver.py:747-756)
            self.last_rf_block = x.astype(np.complex64)
            return jnp.asarray(cplx.pack(self.last_rf_block))

        def finish(audio_p, t_start):
            # sync point: device -> host pull of an ALREADY-dispatched
            # block; with the one-block pipeline below the compute had a
            # whole iteration to complete, so this pays transfer only
            audio = cplx.unpack(np.asarray(audio_p).reshape(
                self.bank.n_rx, d.out_block, 2))
            for i, ring in enumerate(self.audio_rings):
                ring.push(audio[i])
            if self.demod_writer is not None:
                self.demod_writer.save_data(audio.T)
            if self.psd_callback is not None:
                self.psd_callback(self, audio)
            self.n_blocks += 1
            if self.realtime:
                elapsed = time.monotonic() - t_start
                if elapsed < block_budget:
                    time.sleep(block_budget - elapsed)

        # one-block software pipeline: while the device computes block k,
        # the host reads block k+1 AND drains block k-1 to the sinks (the
        # reference's thread/ring-buffer decoupling, SURVEY §2.10 row 2,
        # without threads — JAX async dispatch is the second stage)
        nxt = read_block()
        pending = None       # (device_buffer, t_start) in flight
        while not self._stop.is_set():
            if nxt is None:
                break
            # n_blocks is cumulative across run() calls (self.n_blocks
            # counts completed blocks; one more may be in flight)
            if n_blocks is not None and \
                    self.n_blocks + (pending is not None) >= n_blocks:
                break
            if deadline and time.monotonic() > deadline:
                break
            self._apply_pending()
            with self.profiler:
                t_start = time.monotonic()
                audio_p = self.bank.step_device(nxt)   # async dispatch
                nxt = read_block()                     # overlap host read
                if pending is not None:
                    finish(*pending)                   # drain block k-1
            pending = (audio_p, t_start)
        if pending is not None:
            finish(*pending)
        return self.profiler

    def stop(self):
        self._stop.set()

    def run_in_thread(self, **kw) -> threading.Thread:
        t = threading.Thread(target=self.run, kwargs=kw, daemon=True)
        t.start()
        return t
