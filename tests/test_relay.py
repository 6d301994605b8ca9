"""Tunnel-death hardening (VERDICT r3 item 1): relay probes, watchdogs,
and the driver entry points' capture-proof behavior when the axon relay
is dead. No reference equivalent — harness robustness for this
environment's tunneled TPU."""
import json
import os
import socket
import subprocess
import sys
import threading
import time
from pathlib import Path

import pytest

from view_neti_tpu.utils import relay

pytestmark = pytest.mark.quick

REPO = Path(__file__).resolve().parents[1]


def _closed_port() -> int:
    """A port that was just bound+released, so nothing listens on it."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestRelayProbe:
    def test_dead_ports_probe_false(self, monkeypatch):
        monkeypatch.setattr(relay, "RELAY_PORTS", (_closed_port(),))
        assert relay.relay_alive(timeout_s=0.5) is False

    def test_live_port_probe_true(self, monkeypatch):
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        try:
            monkeypatch.setattr(relay, "RELAY_PORTS",
                                (srv.getsockname()[1],))
            assert relay.relay_alive(timeout_s=0.5) is True
        finally:
            srv.close()

    def test_wait_for_relay_bounded(self, monkeypatch):
        monkeypatch.setattr(relay, "RELAY_PORTS", (_closed_port(),))
        t0 = time.monotonic()
        assert relay.wait_for_relay(window_s=0.5, poll_s=0.1) is False
        assert time.monotonic() - t0 < 5.0

    def test_wait_for_relay_returns_when_port_opens(self, monkeypatch):
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        port = srv.getsockname()[1]
        monkeypatch.setattr(relay, "RELAY_PORTS", (port,))

        def _open_late():
            time.sleep(0.3)
            srv.listen(1)

        t = threading.Thread(target=_open_late)
        t.start()
        try:
            assert relay.wait_for_relay(window_s=10.0, poll_s=0.1) is True
        finally:
            t.join()
            srv.close()

    def test_tpu_requested_follows_env(self, monkeypatch):
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        assert relay.tpu_requested() is False
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        assert relay.tpu_requested() is False
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        assert relay.tpu_requested() is True
        monkeypatch.delenv("JAX_PLATFORMS")
        assert relay.tpu_requested() is True


class TestHangWatchdog:
    def test_fires_after_timeout(self):
        fired = threading.Event()
        relay.hang_watchdog(0.1, fired.set)
        assert fired.wait(5.0)

    def test_cancel_prevents_firing(self):
        fired = threading.Event()
        cancel = relay.hang_watchdog(0.2, fired.set)
        cancel()
        time.sleep(0.4)
        assert not fired.is_set()


class TestBenchCaptureProof:
    def test_bench_emits_parsable_error_json_when_relay_dead(self):
        """bench.py with a dead relay must print ONE parsable JSON line
        with an 'error' field and exit 0 (r3's capture was a bare rc=1
        traceback, VERDICT r3 weak #1)."""
        env = dict(os.environ)
        env.update(PALLAS_AXON_POOL_IPS="127.0.0.1", JAX_PLATFORMS="axon",
                   BENCH_RELAY_WAIT="1",
                   VIEW_NETI_RELAY_PORTS=str(_closed_port()))
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], env=env,
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-2000:]
        line = out.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        assert rec["unit"] == "error"
        assert "relay unreachable" in rec["error"]
        assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
