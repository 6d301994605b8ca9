"""Axon tunnel liveness probes + hang watchdogs for driver entry points.

The TPU in this environment is reached through a loopback stdio relay
(``/root/.tpu_init.py``) that forwards ``127.0.0.1:{8082,8083,...}`` to the
axon host. When the relay dies, JAX backend init either raises UNAVAILABLE
quickly or blocks forever inside the PJRT client's dial loop. Round 3's
driver artifacts were lost to exactly this: ``BENCH_r03.json`` rc=1 and
``MULTICHIP_r03.json`` rc=124 (VERDICT.md "What's weak" #1/#2). These
helpers let ``bench.py`` / ``__graft_entry__.py`` detect a dead tunnel with
a plain TCP probe (no JAX device access, so no lease contention) and turn
a would-be hang into a bounded, parsable failure.

No reference equivalent — this is harness robustness for the tunneled-TPU
environment, not a ViewNeTI feature.
"""
import os
import socket
import threading
import time

# First ports the relay listens on (see /root/.tpu_init.py PORTS). Probing
# any one open is enough: the relay binds all of them at startup.
# VIEW_NETI_RELAY_PORTS overrides for tests (cross-process monkeypatch).
RELAY_PORTS = tuple(
    int(p) for p in os.environ.get("VIEW_NETI_RELAY_PORTS",
                                   "8082,8083,8087").split(","))


def tpu_requested() -> bool:
    """True when this process would initialize the tunneled axon backend.

    The axon sitecustomize registers the backend whenever
    ``PALLAS_AXON_POOL_IPS`` is set; ``JAX_PLATFORMS=cpu`` (or the var being
    absent) means device access stays on host CPU and no probe is needed.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "axon" not in platforms.split(","):
        return False
    return True


def relay_alive(timeout_s: float = 2.0) -> bool:
    """TCP-connect probe of the relay's listen ports (no JAX involved)."""
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=timeout_s):
                return True
        except OSError:
            continue
    return False


def wait_for_relay(window_s: float, poll_s: float = 15.0) -> bool:
    """Poll until the relay answers or ``window_s`` elapses.

    Returns immediately on the first live probe; a zero/negative window
    degenerates to a single probe.
    """
    deadline = time.monotonic() + window_s
    while True:
        if relay_alive():
            return True
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(poll_s, max(0.1, deadline - time.monotonic())))


def hang_watchdog(timeout_s: float, on_timeout):
    """Arm a daemon timer that fires ``on_timeout()`` after ``timeout_s``.

    Returns a zero-arg cancel function. Used to bound JAX backend init /
    whole-bench wall time: the callback typically prints a parsable error
    record and ``os._exit``\\ s, because a thread cannot interrupt a peer
    blocked inside a native dial loop.
    """
    cancelled = threading.Event()

    def _run():
        if not cancelled.wait(timeout_s):
            on_timeout()

    t = threading.Thread(target=_run, daemon=True,
                         name=f"hang-watchdog-{timeout_s:.0f}s")
    t.start()
    return cancelled.set
