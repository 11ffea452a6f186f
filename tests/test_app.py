"""End-to-end application wiring tests (the composition the reference
exercises through pySDR.py/am.py): config build, replay -> demod -> wav,
the --rtty full-chain decode, presets, and the control-plane startup."""

import os
import time
import wave

import numpy as np
import pytest

from pysdr_tpu import app as app_mod
from pysdr_tpu.io import datfile
from pysdr_tpu.tables import Mode


def run_app(argv):
    args = app_mod.build_parser().parse_args(argv)
    a = app_mod.App(args)
    a.run()
    return a


def test_build_config_modes_and_mutes():
    args = app_mod.build_parser().parse_args(
        ["--fc", "100.0", "100.02", "--modes", "AM", "NFM",
         "--mute", "1", "--auto-mute", "--squelch", "8"])
    cfg = app_mod.build_config(args)
    assert [r.mode for r in cfg.receivers] == [Mode.AM, Mode.NFM]
    assert not cfg.receivers[0].muted and cfg.receivers[1].muted
    assert all(r.auto_mute for r in cfg.receivers)
    assert cfg.receivers[0].squelch_db == 8.0


def test_app_synth_to_wav(tmp_path):
    """The am.py moment through the real App: synth source -> bank ->
    executive -> wav sink; RX0 carries a 400 Hz AM tone."""
    prefix = str(tmp_path / "out")
    a = run_app(["--fs", "0.512", "--block", "4096", "--blocks", "8",
                 "--wav", prefix])
    w = wave.open(prefix + "_rx0.wav")
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels())[:, 0].astype(np.float32)
    assert len(d) >= 4096 * 6
    seg = d[len(d) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    pk = np.fft.rfftfreq(len(seg), 1.0 / w.getframerate())[
        5 + np.argmax(sp[5:])]
    assert abs(pk - 400.0) < 10.0, pk


def _wav_channels(path):
    w = wave.open(path)
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels()).astype(np.float32)
    return d, w.getframerate()


def _peak_hz(x, fs):
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1.0 / fs)[5 + np.argmax(sp[5:])]


def test_app_stereo_pairs(tmp_path):
    """--stereo: RX pairs packed into one player, RX0 in L / RX1 in R
    (reference scheme-2 routing, receiver.py:158-189). RX0 carries
    400 Hz, RX1 carries 800 Hz."""
    prefix = str(tmp_path / "st")
    # --video-bw 8 keeps each channel to +-8 kHz so the neighbor station
    # 20 kHz away stays out of the envelope detector (with the default
    # Max video filter both stations share the +-24 kHz decimated band
    # and AM envelopes mix, which is physics, not a routing bug)
    a = run_app(["--fs", "0.512", "--block", "4096", "--blocks", "8",
                 "--fc", "0.6", "0.62", "--video-bw", "8",
                 "--stereo", "--wav", prefix])
    assert len(a.players) == 1
    d, fr = _wav_channels(prefix + "_rx0.wav")
    assert d.shape[1] == 2
    seg = d[len(d) // 2:]
    assert abs(_peak_hz(seg[:, 0], fr) - 400.0) < 10.0
    assert abs(_peak_hz(seg[:, 1], fr) - 800.0) < 10.0
    # channel separation: each tone must dominate its own side
    for ch, f_own, f_other in ((0, 400.0, 800.0), (1, 800.0, 400.0)):
        sp = np.abs(np.fft.rfft(seg[:, ch] * np.hanning(len(seg))))
        frq = np.fft.rfftfreq(len(seg), 1.0 / fr)
        own = sp[np.argmin(np.abs(frq - f_own))]
        other = sp[np.argmin(np.abs(frq - f_other))]
        assert own > 100.0 * other


def test_app_aux_path(tmp_path):
    """--aux-wav: RX0 audio through the 800-1300 Hz speech BPF
    (reference receiver.py:214-221). The default 400 Hz synth tone sits
    in the stopband, so the aux output must be strongly attenuated
    relative to the main wav; the filter itself must pass 1 kHz."""
    from pysdr_tpu.runtime.audio import aux_bandpass_taps
    prefix = str(tmp_path / "m")
    aux = str(tmp_path / "aux.wav")
    run_app(["--fs", "0.512", "--block", "4096", "--blocks", "8",
             "--wav", prefix, "--aux-wav", aux])
    main, fr = _wav_channels(prefix + "_rx0.wav")
    auxd, fr2 = _wav_channels(aux)
    assert fr2 == fr and auxd.shape[1] == 1
    m = main[len(main) // 2:, 0]
    x = auxd[len(auxd) // 2:, 0]
    assert np.sqrt(np.mean(x**2)) < 0.15 * np.sqrt(np.mean(m**2))
    # passband sanity: |H(1 kHz)| ~ 1, |H(400 Hz)| small
    taps = aux_bandpass_taps(fr)
    w = np.exp(-2j * np.pi * np.arange(len(taps)) / fr)
    h = lambda f: abs(np.sum(taps * w**f))  # noqa: E731
    assert h(1000.0) > 0.7 and h(400.0) < 0.05


def test_app_replay_roundtrip(tmp_path):
    """--save-iq record then --replay of the same capture demodulates
    the same station (reference record/replay oracle, SURVEY §4.1)."""
    a = run_app(["--fs", "0.512", "--block", "4096", "--blocks", "6",
                 "--save-iq", "--save-dir", str(tmp_path)])
    dats = [f for f in os.listdir(tmp_path) if f.endswith(".dat")]
    assert len(dats) == 1
    wav_prefix = str(tmp_path / "replayed")
    a2 = run_app(["--replay", str(tmp_path / dats[0]), "--no-loop",
                  "--block", "4096", "--wav", wav_prefix])
    w = wave.open(wav_prefix + "_rx0.wav")
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels())[:, 0].astype(np.float32)
    seg = d[len(d) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    pk = np.fft.rfftfreq(len(seg), 1.0 / w.getframerate())[
        5 + np.argmax(sp[5:])]
    assert abs(pk - 400.0) < 10.0, pk


def test_app_rtty_full_chain(tmp_path):
    """--rtty through the COMPLETE chain: RF-rate FSK capture -> replay
    source -> NCO/decimate (IQ passthrough demod) -> baseband tap ->
    wideband RTTY decoder (reference demodulate_data RTTY feed,
    receiver.py:286-290)."""
    from pysdr_tpu.models import rtty as rtty_mod
    fs_rf = 512e3
    dsig = rtty_mod.RTTYDesign(fs=fs_rf)
    # station 1 kHz above the RX center
    x = rtty_mod.synthesize_rtty("RYRY CQ CQ DE AA2IL AA2IL", dsig,
                                 carrier_hz=120e3 + 1000.0)
    path = str(tmp_path / "rtty_capture.dat")
    w = datfile.DatWriter(path, fs=fs_rf, fc=100e6 - 120e3)
    w.save_data(x)
    w.close()
    a = run_app(["--replay", path, "--no-loop", "--fc", "100.0",
                 "--mode", "RTTY", "--block", "4096", "--rtty", "0"])
    text = "".join(a.rtty_text)
    assert "AA2IL" in text, (text, a.rtty_text)


def test_app_rtty_composes_with_mesh_and_audio_wire(tmp_path):
    """VERDICT r3 #4: --mesh no longer excludes --audio-wire and --rtty.
    The sharded streaming bank quantizes the audio return inside each
    shard and emits the baseband tap, so a 2-stream mesh run with the
    i16 audio wire decodes the same RTTY text as the serial path."""
    from pysdr_tpu.models import rtty as rtty_mod
    fs_rf = 512e3
    dsig = rtty_mod.RTTYDesign(fs=fs_rf)
    x = rtty_mod.synthesize_rtty("RYRY CQ CQ DE AA2IL AA2IL", dsig,
                                 carrier_hz=120e3 + 1000.0)
    path = str(tmp_path / "rtty_capture.dat")
    w = datfile.DatWriter(path, fs=fs_rf, fc=100e6 - 120e3)
    w.save_data(x)
    w.close()
    a = run_app(["--replay", path, "--no-loop", "--fc", "100.0",
                 "--mode", "RTTY", "--block", "4096", "--rtty", "0",
                 "--mesh", "2,1", "--audio-wire", "i16"])
    assert a.bank.__class__.__name__ == "ShardedStreamBank"
    text = "".join(a.rtty_text)
    assert "AA2IL" in text, (text, a.rtty_text)


def test_app_control_plane_services():
    """--hamlib/--udp-port start servers that drive the running bank."""
    import socket
    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--hamlib",
         "--hamlib-port", "0", "--udp-port", "0"])
    a = app_mod.App(args)
    a.start_services()
    try:
        # hamlib: retune RX0 over TCP (rigctl protocol); applied at the
        # next block boundary
        port = a.hamlib_servers[0].port
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(b"F 100100000\n")
        assert s.recv(64).startswith(b"RPRT 0")
        # udp: SO2V arms auto-mute
        u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        u.sendto(b"SO2V:ON\n", ("127.0.0.1", a.udp_server.port))
        u.close()
        deadline = time.monotonic() + 10
        while a.ex._cmd_q.qsize() < 3 and time.monotonic() < deadline:
            time.sleep(0.02)
        a.ex.run(n_blocks=2)      # block boundary applies the commands
        s.sendall(b"f\n")
        reply = s.recv(64)
        s.close()
        assert b"100100000" in reply, reply
        assert a.bank._rx_cfgs[0].auto_mute
        assert not a.bank._rx_cfgs[0].muted
    finally:
        a.stop_services()
        a.ex.stop()


def test_app_list_presets(capsys):
    rc = app_mod.main(["--list-presets"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MHz" in out or len(out.splitlines()) > 0


def test_app_channelize(tmp_path):
    """--channelize N: polyphase channelizer through the full app (synth
    passband -> channelize -> per-channel demod -> wav)."""
    prefix = str(tmp_path / "chan")
    a = run_app(["--channelize", "16", "--fs", "0.768", "--block", "2048",
                 "--blocks", "6", "--fc", "100.0", "--no-agc",
                 "--wav", prefix])
    assert a.bank.n_rx == 16
    w = wave.open(prefix + "_rx4.wav")
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels())[:, 0].astype(np.float32)
    seg = d[len(d) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    pk = np.fft.rfftfreq(len(seg), 1.0 / w.getframerate())[
        5 + np.argmax(sp[5:])]
    assert abs(pk - 500.0) < 15.0, pk   # station on ch4 carries 500 Hz
    # idle channel stays quiet
    w2 = wave.open(prefix + "_rx3.wav")
    d2 = np.frombuffer(w2.readframes(w2.getnframes()), np.int16)
    assert np.abs(d2[len(d2) // 2:]).mean() < \
        0.1 * np.abs(d[len(d) // 2:]).mean()


def test_probe_tool(tmp_path, capsys):
    """The device-exploration smoke tool (reference playpen/soapy/simple
    scripts + check_sdr_settings dump, utils.py:358-422)."""
    from pysdr_tpu import probe
    # capture to probe
    x = (np.exp(2j * np.pi * 0.01 * np.arange(4096))).astype(np.complex64)
    path = str(tmp_path / "p.dat")
    w = datfile.DatWriter(path, fs=512e3, fc=7.1e6)
    w.save_data(x)
    w.close()
    rc = probe.main(["--replay", path, "--smoke"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "device[0]" in out
    assert "fs=0.512000 MHz" in out
    assert "smoke:" in out and "OK" in out
    assert probe.main(["--replay", str(tmp_path / "nope.dat")]) == 2


def test_app_wfm_192k_audio(tmp_path):
    """WFM at the reference's 192 kHz audio rate (reference
    params.py:400-404: FS_OUT=192k for WFM) through the full app: synth
    FM carrier -> WFM discriminator + de-emphasis -> 192 kHz wav with
    the 400 Hz tone on top (VERDICT r2 #8)."""
    prefix = str(tmp_path / "wfm")
    run_app(["--fs", "2.048", "--fs-out", "192", "--mode", "WFM",
             "--block", "8192", "--blocks", "6", "--wav", prefix])
    w = wave.open(prefix + "_rx0.wav")
    assert w.getframerate() == 192000
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels())[:, 0].astype(np.float32)
    assert len(d) >= 4 * 8192
    seg = d[len(d) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1.0 / 192000)
    pk = f[5 + np.argmax(sp[5:])]
    assert abs(pk - 400.0) < 10.0, pk


def test_transverter_offset_shifts_device_center_only():
    """--transverter models an up-converter ahead of the SDR (reference
    +125 MHz Ham-It-Up, gui.py:1940-1944): the device center shifts, the
    in-passband NCO plan (dial-frequency math) does not."""
    base = app_mod.build_parser().parse_args(
        ["--fc", "14.1", "14.12", "--fs", "0.512"])
    shifted = app_mod.build_parser().parse_args(
        ["--fc", "14.1", "14.12", "--fs", "0.512",
         "--transverter", "125"])
    c0 = app_mod.build_config(base)
    c1 = app_mod.build_config(shifted)
    assert c1.sdr_center_hz == c0.sdr_center_hz + 125e6
    assert c1.channel_offsets_hz() == c0.channel_offsets_hz()


def test_direct_sampling_auto_switch_modeling():
    """RTL-class front-ends need Q-branch direct sampling below the
    tuner's ~24 MHz minimum; the reference switches automatically on
    retune (receiver.py:671-680). Modeled as a config/source property."""
    hf = app_mod.build_config(app_mod.build_parser().parse_args(
        ["--fc", "7.1", "--fs", "0.512"]))          # 40 m -> direct
    vhf = app_mod.build_config(app_mod.build_parser().parse_args(
        ["--fc", "144.2", "--fs", "0.512"]))        # 2 m -> quadrature
    assert hf.sampling_mode() == "direct"
    assert vhf.sampling_mode() == "quadrature"
    # a transverter ahead of the SDR moves the DEVICE center, so it also
    # flips the needed sampling mode (the Ham-It-Up exists precisely to
    # avoid direct sampling)
    up = app_mod.build_config(app_mod.build_parser().parse_args(
        ["--fc", "7.1", "--fs", "0.512", "--transverter", "125"]))
    assert up.sampling_mode() == "quadrature"


def test_source_device_model_gain_and_ppm(tmp_path):
    """Device-facing source settings with functional effect: RF gain
    scales the stream; an uncorrected ppm error shifts the received
    passband by -fc*ppm*1e-6 (reference setupSDR staging + fake-driver
    surface, utils.py:122-353)."""
    from pysdr_tpu.io import synth
    fc = 100e6
    spec = [synth.SignalSpec(offset_hz=50e3, mode="cw", amplitude=0.1)]
    s0 = synth.SynthSource(spec, 512e3, fc=fc)
    s1 = synth.SynthSource(spec, 512e3, fc=fc, rf_gain_db=20.0, ppm=2.0)
    x0, x1 = s0.read_data(1 << 16), s1.read_data(1 << 16)
    assert np.isclose(np.std(x1) / np.std(x0), 10.0, rtol=1e-3)
    f = np.fft.fftfreq(len(x1), 1 / 512e3)
    pk = f[np.argmax(np.abs(np.fft.fft(x1)))]
    assert abs(pk - (50e3 - fc * 2e-6)) < 10.0   # tone 200 Hz low
    # Soapy-shaped setters carry state
    s1.set_antenna("B")
    s1.set_gain(3.0)
    assert s1.get_antenna() == "B" and s1.get_gain() == 3.0


def test_fifo_loopback_audio(tmp_path):
    """--fifo routes demod audio into a named pipe as s16le PCM (the
    PulseAudio-loopback analogue, start_loopback:1-100): a reader on the
    pipe receives the 400 Hz tone; with no reader the radio never
    blocks."""
    import threading

    fifo = str(tmp_path / "audio.fifo")
    chunks: list[bytes] = []

    def reader():
        with open(fifo, "rb") as f:
            while True:
                b = f.read(4096)
                if not b:
                    return
                chunks.append(b)

    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--blocks", "8",
         "--fifo", fifo])
    a = app_mod.App(args)           # creates the fifo
    t = threading.Thread(target=reader, daemon=True)
    t.start()
    a.run()
    t.join(timeout=5)
    pcm = np.frombuffer(b"".join(chunks), "<i2").astype(np.float32)
    assert len(pcm) > 4096 * 4
    seg = pcm[len(pcm) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    pk = np.fft.rfftfreq(len(seg), 1 / 48e3)[5 + np.argmax(sp[5:])]
    assert abs(pk - 400.0) < 10.0, pk


def test_app_mesh_cli(tmp_path):
    """The --mesh CLI path end-to-end in a subprocess on the 8-virtual-
    device CPU mesh: a 2x2 stream x ch run demodulates the synth tones
    into wavs exactly like the serial path."""
    import subprocess
    import sys

    prefix = str(tmp_path / "mesh")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if "xla_force_host_platform_device_count" not in \
            env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "-m", "pysdr_tpu", "--fs", "0.512",
         "--block", "4096", "--blocks", "4", "--fc", "0.6", "0.62",
         "--mesh", "2,2", "--wav", prefix],
        env=env, capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr[-1500:]
    w = wave.open(prefix + "_rx0.wav")
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels())[:, 0].astype(np.float32)
    assert len(d) > 4096 * 4     # 4 super-blocks x 2 stream shards
    seg = d[len(d) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    pk = np.fft.rfftfreq(len(seg), 1.0 / w.getframerate())[
        5 + np.argmax(sp[5:])]
    assert abs(pk - 400.0) < 10.0, pk


def test_app_channelize_mesh_cli(tmp_path):
    """--channelize + --mesh: the sharded channelizer from the CLI on the
    8-virtual-device CPU mesh (2 stream x 4 ch over 8 channels)."""
    import subprocess
    import sys

    prefix = str(tmp_path / "chmesh")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if "xla_force_host_platform_device_count" not in \
            env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "-m", "pysdr_tpu", "--channelize", "8",
         "--fs", "0.768", "--fc", "100.0", "--block", "4096",
         "--blocks", "3", "--mesh", "2,4", "--wav", prefix],
        env=env, capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr[-1500:]
    # synth puts an AM station on every 4th channel; channel 0 carries
    # a 300 Hz tone
    w = wave.open(prefix + "_rx0.wav")
    d = np.frombuffer(w.readframes(w.getnframes()), np.int16).reshape(
        -1, w.getnchannels())[:, 0].astype(np.float32)
    assert len(d) > 4096 * 2
    seg = d[len(d) // 2:]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    pk = np.fft.rfftfreq(len(seg), 1.0 / w.getframerate())[
        5 + np.argmax(sp[5:])]
    assert abs(pk - 300.0) < 10.0, pk


def test_app_bb_pane(tmp_path):
    """VERDICT r3 #6: --bb wires the BASEBAND display domain end-to-end
    (the reference's RF/BB/AF three-domain plotting + show-BB toggle,
    gui.py:121-221): a station 2 kHz above the dial peaks the BB PSD at
    dial + 2 kHz."""
    fs = 512e3
    n = 1 << 21
    t = np.arange(n) / fs
    off = 120e3 + 2000.0          # foffset + 2 kHz off the dial
    x = (0.45 * (1 + 0.5 * np.sin(2 * np.pi * 400.0 * t))
         * np.exp(2j * np.pi * off * t)).astype(np.complex64)
    path = str(tmp_path / "bb.dat")
    w = datfile.DatWriter(path, fs=fs, fc=100e6 - 120e3)
    w.save_data(x)
    w.close()
    a = run_app(["--replay", path, "--no-loop", "--fc", "100.0",
                 "--mode", "AM", "--block", "4096", "--bb",
                 "--psd-every", "1"])
    fr = a.display.frames.get("BB0")
    assert fr is not None, list(a.display.frames)
    pk = fr.freqs_hz[np.argmax(fr.psd_db)]
    assert abs(pk - (100e6 + 2000.0)) < 200.0, pk


def test_wfm_auto_selects_192k_audio(tmp_path):
    """--mode WFM without --fs-out runs at 192 kHz audio (the
    reference's per-mode srate selection, params.py:400-404): at the
    48 kHz default the decimator would crush the ~200 kHz FM signal
    before the discriminator."""
    prefix = str(tmp_path / "wfm")
    run_app(["--mode", "WFM", "--fs", "2.048", "--block", "8192",
             "--blocks", "3", "--wav", prefix])
    w = wave.open(prefix + "_rx0.wav")
    assert w.getframerate() == 192000
    # explicit --fs-out still wins
    args = app_mod.build_parser().parse_args(
        ["--mode", "WFM", "--fs-out", "96"])
    cfg = app_mod.build_config(args)
    assert cfg.fs_out == 96e3
    # and non-FM modes keep the 48 kHz default
    args = app_mod.build_parser().parse_args(["--mode", "AM"])
    assert app_mod.build_config(args).fs_out == 48e3


def test_cli_clean_errors_for_config_mistakes(tmp_path):
    """Operator mistakes exit 2 with one-line errors, not tracebacks."""
    import subprocess
    import sys
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for argv in (["--mesh", "64,64", "--blocks", "1"],
                 ["--rtl-tcp", "127.0.0.1:9", "--blocks", "1"]):
        out = subprocess.run(
            [sys.executable, "-m", "pysdr_tpu", *argv], env=env,
            capture_output=True, text=True, timeout=180,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert out.returncode == 2, (argv, out.returncode)
        assert "error:" in out.stderr and "Traceback" not in out.stderr, \
            out.stderr[-400:]


def test_app_save_baseband_tap(tmp_path):
    """--save-baseband records the per-RX post-mix/decimate baseband
    (the reference's third recording tap, params.py:136-141 /
    receiver.py:292-297): the capture holds the AM carrier with its
    400 Hz modulation."""
    run_app(["--fs", "0.512", "--block", "4096", "--blocks", "6",
             "--save-baseband", "--save-dir", str(tmp_path)])
    dats = [f for f in os.listdir(tmp_path) if f.startswith("baseband")]
    assert len(dats) == 1
    x, hdr = datfile.read_dat(str(tmp_path / dats[0]))
    assert hdr.fs == 48e3 and hdr.nchan == 1 and hdr.tag == "baseband"
    assert len(x) >= 6 * 4096      # out_block rounds to the plan
    env = np.abs(x[len(x) // 2:])
    sp = np.abs(np.fft.rfft((env - env.mean()) * np.hanning(len(env))))
    pk = np.fft.rfftfreq(len(env), 1 / 48e3)[5 + np.argmax(sp[5:])]
    assert abs(pk - 400.0) < 10.0, pk


def test_cli_parity_flags(tmp_path):
    """The remaining reference RUN_TIME_PARAMS knobs (-bfo, -nfilt,
    -ant, -delay, -pan_dr) are reachable from the CLI and reach their
    subsystems."""
    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--mode", "CW",
         "--bfo", "600", "--nfilt", "128", "--ant", "B",
         "--pan-dr", "40", "--psd"])
    cfg = app_mod.build_config(args)
    assert cfg.receivers[0].bfo_hz == 600.0
    assert cfg.af_taps == 128
    a = app_mod.App(args)
    assert a.source.get_antenna() == "B"
    assert a.display.rf.cfg.pan_dr_db == 40.0
    # --delay reaches the player start threshold
    args2 = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--delay", "2048"])
    assert args2.delay == 2048


def test_app_channelize_video_bw_cli():
    """ADVICE r4: --video-bw must reach the channelizer's per-channel
    pre-demod filter (it silently selected the Max row before)."""
    args = app_mod.build_parser().parse_args(
        ["--channelize", "8", "--fs", "0.384", "--fc", "100.0",
         "--video-bw", "6"])
    bank, _, cfg = app_mod.build_channelizer(args)
    assert all(cs.video_bw_hz == 6e3 for cs in cfg.channels)
    # the selected filter row is the 6 kHz one, not Max
    from pysdr_tpu import tables
    want = tables.find_filter_index(6e3, bank.video_bws)
    max_row = len(bank.video_bws) - 1
    import numpy as np
    rows = np.asarray(bank.params.video_row)
    assert rows.tolist() == [want] * 8 and want != max_row


def test_ft8_ft4_layout_expansion():
    """--ft8/--ft4/--ft44 one-flag RX layout expansion (reference
    params.py:254-267 and expand_ft4 utils.py:442-453)."""
    # reference -ft8: a single RX grows into main + FT8 sub-RX (USB)
    args = app_mod.build_parser().parse_args(
        ["--fc", "7.1", "--mode", "LSB", "--fs", "1.0", "--ft8"])
    cfg = app_mod.build_config(args)
    assert [r.fc_hz for r in cfg.receivers] == [7.1e6, 7.074e6]
    assert [r.mode for r in cfg.receivers] == [
        Mode.LSB, Mode.USB]

    # reference -ft4: each RX doubled onto its band's FT4 slot
    args = app_mod.build_parser().parse_args(
        ["--fc", "7.074", "--mode", "USB", "--fs", "1.0", "--ft4"])
    cfg = app_mod.build_config(args)
    assert [r.fc_hz for r in cfg.receivers] == [7.074e6, 7.0475e6]

    # reference -ft44: one FT4 sub-RX appended after the main layout
    args = app_mod.build_parser().parse_args(
        ["--fc", "14.074", "--fs", "1.0", "--mode", "USB", "--ft44"])
    cfg = app_mod.build_config(args)
    assert [r.fc_hz for r in cfg.receivers] == [14.074e6, 14.080e6]

    # band-list form with no --fc: the slots ARE the layout
    args = app_mod.build_parser().parse_args(
        ["--ft8", "40m", "--ft4", "40m", "--fs", "1.0"])
    cfg = app_mod.build_config(args)
    assert [r.fc_hz for r in cfg.receivers] == [7.074e6, 7.0475e6]
    assert all(r.mode == Mode.USB for r in cfg.receivers)

    # slots outside one passband fail validation (a 40m+20m spread
    # cannot fit an 8 MHz device passband)
    with pytest.raises((ValueError, AssertionError)):
        args = app_mod.build_parser().parse_args(
            ["--ft8", "40m", "20m", "--fs", "1.0"])
        app_mod.build_config(args)

    # unknown band is a clean config error
    with pytest.raises(ValueError):
        args = app_mod.build_parser().parse_args(
            ["--ft8", "99m", "--fs", "1.0"])
        app_mod.build_config(args)

    # a full FT8 run demodulates through the expanded layout
    a = run_app(["--fc", "7.1", "--fs", "0.512", "--ft8", "--block",
                 "2048", "--blocks", "3"])
    assert a.bank.n_rx == 2
