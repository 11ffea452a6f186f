import numpy as np
import pytest

from pysdr_tpu.config import PipelineConfig, ReceiverConfig
from pysdr_tpu.io import synth
from pysdr_tpu.models.receiver import ReceiverBank
from pysdr_tpu.runtime.executive import Executive
from pysdr_tpu.runtime.ringbuffer import RingBuffer
from pysdr_tpu.runtime.watchdog import WatchDog
from pysdr_tpu.tables import Mode


def test_ringbuffer_basic():
    rb = RingBuffer("t", 16, "float32")
    rb.push(np.arange(10, dtype=np.float32))
    assert rb.nsamps == 10 and rb.ready(10) and not rb.ready(11)
    out = rb.pull(6)
    np.testing.assert_array_equal(out, np.arange(6))
    rb.push(np.arange(10, 22, dtype=np.float32))  # wraps
    out = rb.pull(16)
    np.testing.assert_array_equal(out, np.arange(6, 22))


def test_ringbuffer_overflow_drop_oldest():
    rb = RingBuffer("t", 8, "float32")
    rb.push(np.arange(6, dtype=np.float32))
    rb.push(np.arange(6, 12, dtype=np.float32))
    assert rb.overflows == 1
    out = rb.pull(8)
    np.testing.assert_array_equal(out, np.arange(4, 12))


def test_ringbuffer_underflow_zero_pad():
    rb = RingBuffer("t", 8, "float32")
    rb.push(np.ones(3, np.float32))
    out = rb.pull(5)
    assert rb.underflows == 1
    np.testing.assert_array_equal(out, [1, 1, 1, 0, 0])


def test_watchdog_watermarks():
    rb = RingBuffer("wd", 100, "float32")
    wd = WatchDog(rb, fs=100.0)
    rb.push(np.ones(90, np.float32))      # above high water
    wd.check_once()
    assert wd.stats.drops == 1
    assert 0.3 < rb.depth_fraction() < 0.7
    rb.clear()
    rb.push(np.ones(5, np.float32))       # below low water
    wd.check_once()
    assert wd.stats.zero_fills == 1
    assert 0.3 < rb.depth_fraction() < 0.7
    assert wd.alive()


def _mk_exec(**kw):
    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=1024, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM,
                                  agc_enabled=False),))
    bank = ReceiverBank(cfg)
    src = synth.SynthSource(
        [synth.SignalSpec(offset_hz=60e3, mode="am", audio_hz=1000.0)],
        fs=512e3)
    return Executive(bank, src, **kw), bank


def test_executive_runs_blocks_and_fills_rings():
    ex, bank = _mk_exec()
    prof = ex.run(n_blocks=5)
    assert ex.n_blocks == 5
    assert prof.n_blocks == 5
    ring = ex.audio_rings[0]
    assert ring.nsamps == 5 * bank.design.out_block
    audio = ring.pull(ring.nsamps)
    # tone present in the second half (first half settles)
    a = audio.real[len(audio) // 2:]
    assert np.std(a) > 0.05


def test_executive_command_queue_applied_between_blocks():
    ex, bank = _mk_exec()
    ex.post("set_af_gain", 0, 3.0)
    ex.run(n_blocks=2)
    assert float(bank.params.demod.af_gain[0]) == 3.0


def test_executive_record_tap(tmp_path):
    from pysdr_tpu.io import datfile
    ex, bank = _mk_exec()
    w = datfile.DatWriter(str(tmp_path / "demod.dat"), fs=bank.design.fs_out,
                          nchan=bank.n_rx, tag="demod")
    ex.demod_writer = w
    ex.run(n_blocks=3)
    w.close()
    x, hdr = datfile.read_dat(str(tmp_path / "demod.dat"))
    assert hdr.tag == "demod"
    assert len(x) == 3 * bank.design.out_block


@pytest.mark.parametrize("wire,min_snr_db", [("i16", 55.0), ("i8", 25.0)])
def test_executive_wire_formats(wire, min_snr_db):
    """RF blocks shipped as raw CS16/CS8 ints and dequantized on device
    must produce audio matching the float32 wire within the quantization
    noise floor (i16 is lossless for real 8/14-bit SDR front-ends).
    Signal amplitude stays inside ADC full scale |x| <= 1.0 — beyond it
    the wire clips exactly like a real front-end would."""

    def mk(**kw):
        cfg = PipelineConfig(
            fs_in=512e3, fs_out=48e3, out_block=1024, foffset_hz=60e3,
            receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM,
                                      agc_enabled=False),))
        bank = ReceiverBank(cfg)
        src = synth.SynthSource(
            [synth.SignalSpec(offset_hz=60e3, mode="am", audio_hz=1000.0,
                              amplitude=0.45)], fs=512e3)
        return Executive(bank, src, **kw), bank

    ex_f, bank_f = mk()
    ex_q, bank_q = mk(wire=wire)
    ex_f.run(n_blocks=4)
    ex_q.run(n_blocks=4)
    a = ex_f.audio_rings[0].pull(ex_f.audio_rings[0].nsamps).real
    b = ex_q.audio_rings[0].pull(ex_q.audio_rings[0].nsamps).real
    n = len(a) // 2
    a, b = a[n:], b[n:]           # post-settle
    err = a - b
    snr = 10 * np.log10(float(a @ a) / max(float(err @ err), 1e-30))
    assert snr >= min_snr_db, f"{wire}: {snr:.1f} dB"


@pytest.mark.parametrize("wire,min_snr_db", [("i16", 55.0), ("i8", 30.0)])
def test_executive_audio_wire(wire, min_snr_db):
    """Audio leaving the device as int16 (linear) or int8 (mu-law) pairs
    (on-device quantization, host dequant in the executive) matches the
    f32 audio wire at each format's quantization floor (i8 mu-law holds a
    level-independent ~37 dB — monitoring quality for the many-channel
    return)."""
    ex_f, _ = _mk_exec()
    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=1024, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM,
                                  agc_enabled=False),))
    bank_q = ReceiverBank(cfg, audio_wire=wire)
    src = synth.SynthSource(
        [synth.SignalSpec(offset_hz=60e3, mode="am", audio_hz=1000.0)],
        fs=512e3)
    ex_q = Executive(bank_q, src)
    ex_f.run(n_blocks=4)
    ex_q.run(n_blocks=4)
    a = ex_f.audio_rings[0].pull(ex_f.audio_rings[0].nsamps).real
    b = ex_q.audio_rings[0].pull(ex_q.audio_rings[0].nsamps).real
    err = a - b
    snr = 10 * np.log10(float(a @ a) / max(float(err @ err), 1e-30))
    assert snr > min_snr_db, snr


def test_audio_wire_i8_snr_level_independent():
    """The mu-law property that justifies i8 for monitoring audio: SNR
    stays ~constant as the signal level drops (linear i8 would lose 6 dB
    per halving)."""
    import jax

    from pysdr_tpu.ops import cplx

    rng = np.random.default_rng(7)
    x = rng.standard_normal((4096, 2)).astype(np.float32) * 0.3
    snrs = []
    for level in (1.0, 0.25, 0.0625):
        xi = x * level
        q = np.asarray(jax.jit(
            lambda v: cplx.quantize_audio_wire(v, "i8"))(xi))
        y = cplx.dequantize_audio_host(q)
        e = y - xi
        snrs.append(10 * np.log10(
            float((xi * xi).sum()) / max(float((e * e).sum()), 1e-30)))
    assert all(s > 30.0 for s in snrs), snrs
    assert max(snrs) - min(snrs) < 6.0, snrs     # level-independent


def test_fifo_sink_short_write_keeps_alignment(tmp_path):
    """ADVICE r3 (medium): pipe writes above PIPE_BUF are not atomic —
    os.write can return a short, even odd-byte, count. The unwritten tail
    must be carried to the next call so the s16le stream never
    byte-desyncs for downstream decoders."""
    import os

    from pysdr_tpu.runtime.audio import FifoSink

    fifo = str(tmp_path / "t.fifo")
    sink = FifoSink(fifo, 48e3, stereo=False)
    rd = os.open(fifo, os.O_RDONLY | os.O_NONBLOCK)
    try:
        # 50k mono frames = 100 KB, well over the 64 KiB pipe capacity
        # with no reader draining -> guaranteed short write
        frames = np.linspace(-0.5, 0.5, 50000).astype(np.float32)
        sink.write(frames)
        assert len(sink._pending) > 0          # tail retained, not lost
        first = os.read(rd, 1 << 20)
        # next write flushes the pending tail ahead of the new block
        sink.write(np.zeros(1000, np.float32))
        second = os.read(rd, 1 << 20)
        stream = first + second + sink._pending
        assert len(stream) % 2 == 0
        got = np.frombuffer(stream, "<i2")
        ref = (np.clip(np.concatenate([frames,
                                       np.zeros(1000, np.float32)]),
                       -1, 1) * 32767.0).astype("<i2")
        # exact contiguous prefix: nothing dropped, nothing reordered
        assert sink.dropped == 0
        np.testing.assert_array_equal(got, ref[:len(got)])
    finally:
        os.close(rd)
        sink.close()


def test_latency_analyzer(tmp_path, capsys):
    """python -m pysdr_tpu.latency summarizes the watchdog CSV (the
    reference's offline plot_latency.m analysis, sigs/plot_latency.m):
    p50/p95 latency and the self-heal event counts."""
    from pysdr_tpu import latency
    from pysdr_tpu.runtime.ringbuffer import RingBuffer
    from pysdr_tpu.runtime.watchdog import WatchDog

    log = str(tmp_path / "LOG2.TXT")
    rb = RingBuffer("audio0", 4800, "complex64")
    wd = WatchDog(rb, fs=48e3, log_path=log, low=0.25, high=0.75)
    # healthy passes at varying depths
    for n in (2000, 2400, 2600):
        rb.clear()
        rb.push(np.zeros(n, np.complex64))
        wd.check_once()
    # low-water -> zero-fill event ; high-water -> drop event
    rb.clear()
    rb.push(np.zeros(100, np.complex64))
    wd.check_once()
    rb.push(np.zeros(4500, np.complex64))
    wd.check_once()
    wd.stop()

    summary = latency.analyze(log)
    s = summary["audio0"]
    assert s["n_samples"] == 5
    assert 0.0 < s["latency_p50_s"] <= s["latency_p95_s"] \
        <= s["latency_max_s"]
    assert s["zero_fills"] == 1 and s["zeroed_samples"] > 0
    assert s["drops"] == 1 and s["dropped_samples"] > 0

    rc = latency.main([log])
    out = capsys.readouterr().out
    assert rc == 0 and "audio0" in out and "p95" in out


def test_app_watchdog_log_flag(tmp_path):
    """--watchdog-log threads the CSV path into the realtime watchdogs."""
    from pysdr_tpu import app as app_mod
    log = str(tmp_path / "wd.csv")
    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--blocks", "3",
         "--realtime", "--watchdog-log", log])
    a = app_mod.App(args)
    a.run()
    import os
    assert os.path.exists(log)
    from pysdr_tpu import latency
    assert latency.analyze(log) is not None


def test_executive_bb_aligned_with_drained_audio():
    """With the depth-D pipeline, the baseband handed to psd_callback
    consumers must belong to the DRAINED block, not the just-dispatched
    one (bank._last_bb runs D blocks ahead): blocks with strictly
    increasing source amplitude must produce strictly increasing,
    correctly indexed bb RMS in the callback — no skipped leading blocks
    and no repeated trailing ones."""
    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=1024, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM,
                                  agc_enabled=False),))
    bank = ReceiverBank(cfg, emit_baseband=True)

    class SteppedSource:
        def __init__(self):
            self.k = 0

        def read_data(self, n, loop=True):
            t = np.arange(n) / 512e3
            amp = 0.05 * (self.k + 1)
            self.k += 1
            return (amp * np.exp(2j * np.pi * 60e3 * t)
                    ).astype(np.complex64)

    bb_rms = []

    def cb(ex, audio):
        assert ex.drained_bb is not None
        bb_rms.append(float(np.sqrt(np.mean(
            np.asarray(ex.drained_bb) ** 2))))

    ex = Executive(bank, SteppedSource(), psd_callback=cb,
                   pipeline_depth=2)
    ex.run(n_blocks=6)
    assert len(bb_rms) == 6
    assert all(b2 > b1 for b1, b2 in zip(bb_rms, bb_rms[1:])), bb_rms
    # bb index i really is source block i: rms scales as (i+1)
    for i, b in enumerate(bb_rms):
        assert abs(b / bb_rms[0] - (i + 1)) < 0.15 * (i + 1), bb_rms


def test_prefetch_pauses_between_bounded_runs():
    """After a bounded run(n_blocks=N) returns, the prefetch thread must
    stop consuming the source (beyond the bounded read-ahead queue): a
    reader left free-running would strand blocks from a live source and
    spin on the full queue forever. A subsequent run() resumes it and
    the stream stays continuous."""
    import time

    import numpy as np

    from pysdr_tpu.config import PipelineConfig, ReceiverConfig
    from pysdr_tpu.models.receiver import ReceiverBank
    from pysdr_tpu.runtime.executive import Executive
    from pysdr_tpu.tables import Mode

    class CountingSource:
        def __init__(self):
            self.reads = 0

        def read_data(self, n, loop=True):
            self.reads += 1
            return np.zeros(n, np.complex64)

    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=1024, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM),))
    bank = ReceiverBank(cfg)
    src = CountingSource()
    ex = Executive(bank, src)
    ex.run(n_blocks=3)
    assert ex.n_blocks == 3
    time.sleep(0.3)                  # let any in-flight read land
    settled = src.reads
    time.sleep(0.6)                  # 3x the pause-poll period
    assert src.reads == settled, "prefetch kept reading after run()"
    # bounded read-ahead only: the pipeline consumes N+1 (one `nxt` in
    # hand at the break) + at most queue(2) + 1 mid-read in the thread
    assert settled <= 3 + 4
    ex.run(n_blocks=6)               # resumes: three more blocks land
    assert ex.n_blocks == 6
    ex.stop()


def test_prefetch_source_error_surfaces_not_hangs():
    """A source that raises mid-stream must surface the error from
    Executive.run() (the prefetch thread forwards it), never leave the
    loop blocked on the read-ahead queue."""
    import numpy as np
    import pytest

    from pysdr_tpu.config import PipelineConfig, ReceiverConfig
    from pysdr_tpu.models.receiver import ReceiverBank
    from pysdr_tpu.runtime.executive import Executive
    from pysdr_tpu.tables import Mode

    class FlakySource:
        def __init__(self, n_ok_blocks, block):
            self.left = n_ok_blocks * block

        def read_data(self, n, loop=True):
            if self.left <= 0:
                raise TimeoutError("dongle stalled")
            self.left -= n
            return np.zeros(n, np.complex64)

    cfg = PipelineConfig(
        fs_in=512e3, fs_out=48e3, out_block=1024, foffset_hz=60e3,
        receivers=(ReceiverConfig(fc_hz=10e6, mode=Mode.AM),))
    bank = ReceiverBank(cfg)
    ex = Executive(bank, FlakySource(3, bank.design.in_block))
    with pytest.raises(TimeoutError, match="dongle stalled"):
        ex.run(n_blocks=10)
    assert ex.n_blocks <= 4
