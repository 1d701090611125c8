"""Stall-watchdog unit tests (utils/watchdog.py).

The firing path calls ``os._exit`` so it runs in a subprocess; the
keep-alive and configuration paths run in-process.
"""

import os
import subprocess
import sys
import time

from multimodal_moe_tpu.utils import watchdog


def test_beat_is_noop_without_active_watchdog():
    watchdog.beat("nothing listening")  # must not raise


def test_beats_keep_watchdog_alive():
    w = watchdog.StallWatchdog(0.4, initial_grace_s=0.4, poll_s=0.05, label="t")
    w.start()
    try:
        for _ in range(10):
            watchdog.beat("tick")
            time.sleep(0.1)
        # 1.0s elapsed > timeout, but beats refreshed it: still alive.
        assert w._beats >= 10
    finally:
        w.stop()
    assert w not in watchdog._active


def test_enable_disabled_by_env(monkeypatch):
    monkeypatch.setenv("MMOE_STALL_TIMEOUT_S", "0")
    assert watchdog.enable(900.0, label="t") is None


def test_enable_env_override(monkeypatch):
    monkeypatch.setenv("MMOE_STALL_TIMEOUT_S", "123.5")
    w = watchdog.enable(900.0, label="t")
    try:
        assert w is not None and w.timeout_s == 123.5
    finally:
        w.stop()


def test_fires_exit_code_3_with_stack_dump():
    prog = (
        "import time, sys\n"
        "sys.path.insert(0, %r)\n"
        "from multimodal_moe_tpu.utils import watchdog\n"
        "w = watchdog.StallWatchdog(0.2, initial_grace_s=0.2, poll_s=0.05,"
        " label='sub')\n"
        "w.start()\n"
        "watchdog.beat('once')\n"
        "time.sleep(30)\n"  # no further beats -> watchdog must kill us
        "print('SHOULD NOT REACH')\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True, timeout=25
    )
    assert r.returncode == watchdog.StallWatchdog.EXIT_CODE
    assert "NO PROGRESS" in r.stderr
    assert "--- thread" in r.stderr  # stack dump present
    assert "SHOULD NOT REACH" not in r.stdout
