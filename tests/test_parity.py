"""Small parity subsystems: memory monitor, fldigi XML-RPC counter sync,
TX-side rig ops (reference pySDR.py:224-225, watchdog.py:382-414,
rig_control.py:268-363)."""

import threading
import time
from xmlrpc.server import SimpleXMLRPCServer

import pytest

from pysdr_tpu.runtime.fldigi import CounterSync, FldigiClient, \
    find_fldigi_port
from pysdr_tpu.runtime.memmon import MemoryMonitor, rss_bytes


def test_memmon_snapshots(tmp_path):
    path = str(tmp_path / "mem.txt")
    m = MemoryMonitor(path)
    assert m.take_snapshot() > 0
    big = bytearray(32 << 20)          # +32 MB
    assert m.take_snapshot() > 0
    del big
    m.close()
    lines = open(path).read().splitlines()
    assert len(lines) == 2
    assert "MB" in lines[0]
    assert m.peak_bytes >= rss_bytes() - (64 << 20)
    assert m.growth_mb() > 16


class _Keyer:
    """Stand-in fldigi/pyKeyer XML-RPC instance."""

    def __init__(self, counter=0):
        self.counter = counter

    def serve(self):
        srv = SimpleXMLRPCServer(("127.0.0.1", 0), logRequests=False,
                                 allow_none=True)
        srv.register_function(lambda: self.counter, "main.get_counter")

        def set_counter(n):
            self.counter = int(n)
            return 0
        srv.register_function(set_counter, "main.set_counter")
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, srv.server_address[1]


def test_fldigi_counter_sync():
    k1, k2 = _Keyer(counter=7), _Keyer(counter=3)
    s1, p1 = k1.serve()
    s2, p2 = k2.serve()
    try:
        c = FldigiClient(p1)
        assert c.alive() and c.get_counter() == 7
        sync = CounterSync([p1, p2])
        assert sync.sync_once() == 7
        assert k2.counter == 7            # laggard pulled up to max
        k1.counter = 12
        assert sync.sync_once() == 12
        assert k2.counter == 12
    finally:
        s1.shutdown(), s2.shutdown()


def test_fldigi_port_discovery():
    k = _Keyer(counter=1)
    srv, port = k.serve()
    try:
        found = find_fldigi_port(port, port)
        assert found is not None and found.port == port
        assert find_fldigi_port(1, 1) is None       # nothing there
    finally:
        srv.shutdown()


def test_tx_side_rig_ops_loopback():
    """RigConnection TX ops against this framework's own HamlibServer
    (power/mic/monitor levels, antenna select, AF/SQL bank mapping)."""
    from pysdr_tpu import app as app_mod
    from pysdr_tpu.runtime.rig import RigConnection

    args = app_mod.build_parser().parse_args(
        ["--fs", "0.512", "--block", "4096", "--hamlib",
         "--hamlib-port", "0"])
    a = app_mod.App(args)
    a.hamlib_servers[0].start()
    try:
        rig = RigConnection("127.0.0.1", a.hamlib_servers[0].port)
        assert rig.active
        rig.set_tx_pwr(0.75)
        assert rig.read_tx_pwr() == pytest.approx(0.75)
        rig.set_mic_gain(0.4)
        assert rig.read_mic_gain() == pytest.approx(0.4)
        rig.set_monitor_level(0.2)
        assert rig.read_monitor_level() == pytest.approx(0.2)
        rig.select_ant(2)
        assert rig.get_ant() == 2
        # AF / SQL land in the bank's command queue
        rig._set_level("AF", 1.5)
        rig._set_level("SQL", 6.0)
        deadline = time.monotonic() + 5
        while a.ex._cmd_q.qsize() < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        a.ex._apply_pending()
        assert a.bank._rx_cfgs[0].af_gain == pytest.approx(1.5)
        assert a.bank._rx_cfgs[0].squelch_db == pytest.approx(6.0)
        assert rig._get_level("AF") == pytest.approx(1.5)
        # band jump via the band table
        rig.select_band("20m")
        rig.close()
    finally:
        a.hamlib_servers[0].stop()
