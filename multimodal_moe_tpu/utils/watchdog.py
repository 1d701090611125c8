"""Stall watchdog for long device-bound runs.

The tunneled TPU runtime used on this host can wedge machine-wide: a client
blocks forever inside one RPC (a ``device_put`` / ``device_get`` that never
returns) with every thread parked in a futex wait. A wedged *training*
process then silently burns hours of chip budget — the 2026-08-17 RT-DETR
protocol run lost ~2 h exactly this way (epoch 27 froze mid-stream; host CPU
~0, no log line, no error). The reference never needs this because its CUDA
runtime fails fast; a long-lived tunnel client needs an internal deadman.

Design: a daemon thread checks a monotonic "last progress" timestamp that
the hot loops refresh via :func:`beat` (train-step metric fetches, eval
batches, resident-upload chunks — i.e. *completed device round-trips*, not
mere dispatches). If no beat lands within the timeout the watchdog dumps
every Python thread's stack to stderr (so the wedge site is diagnosable
post-mortem) and hard-exits with code 3. Orchestration loops treat a
non-zero exit as "relaunch with --resume", which is the documented wedge
recovery (kill the client, give the tunnel minutes of silence, try again).

``os._exit`` (not ``sys.exit``) is deliberate: the wedged RPC holds locks a
normal interpreter shutdown would join on forever.

Enable from CLIs via :func:`enable` (env ``MMOE_STALL_TIMEOUT_S`` overrides;
``0`` disables). Library code calls :func:`beat`, which is a no-op when no
watchdog is active, so tests and CPU runs are unaffected.
"""

from __future__ import annotations

import os
import sys
import threading
import time
import traceback
from typing import List, Optional

_active: "List[StallWatchdog]" = []


def beat(note: Optional[str] = None) -> None:
    """Record progress on every active watchdog (no-op when none)."""
    if not _active:
        return
    now = time.monotonic()
    for w in _active:
        w._last = now
        w._beats += 1
        if note is not None:
            w._note = note


class StallWatchdog:
    """Deadman timer: hard-exit the process when progress stops.

    ``initial_grace_s`` applies until the first beat (first step after a
    restart includes checkpoint restore + XLA compile, which on this host
    can take tens of minutes cold); ``timeout_s`` applies afterwards.
    """

    EXIT_CODE = 3

    def __init__(
        self,
        timeout_s: float,
        *,
        initial_grace_s: Optional[float] = None,
        poll_s: float = 20.0,
        label: str = "run",
    ) -> None:
        self.timeout_s = float(timeout_s)
        self.initial_grace_s = float(
            initial_grace_s if initial_grace_s is not None else max(timeout_s, 3600.0)
        )
        self.poll_s = float(poll_s)
        self.label = label
        self._last = time.monotonic()
        self._beats = 0
        self._note: Optional[str] = None
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "StallWatchdog":
        if self._thread is not None:
            return self
        self._last = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, name=f"stall-watchdog[{self.label}]", daemon=True
        )
        self._thread.start()
        _active.append(self)
        return self

    def stop(self) -> None:
        self._stop.set()
        if self in _active:
            _active.remove(self)

    def __enter__(self) -> "StallWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- internals -----------------------------------------------------------
    def _run(self) -> None:
        while not self._stop.wait(self.poll_s):
            limit = self.initial_grace_s if self._beats == 0 else self.timeout_s
            idle = time.monotonic() - self._last
            if idle > limit:
                self._fire(idle, limit)

    def _fire(self, idle: float, limit: float) -> None:
        lines = [
            f"[watchdog:{self.label}] NO PROGRESS for {idle:.0f}s "
            f"(limit {limit:.0f}s, {self._beats} beats, "
            f"last activity: {self._note or 'n/a'}) — assuming a wedged "
            f"device RPC; dumping stacks and exiting {self.EXIT_CODE}.",
        ]
        frames = sys._current_frames()
        names = {t.ident: t.name for t in threading.enumerate()}
        for tid, frame in frames.items():
            lines.append(f"--- thread {names.get(tid, tid)} ---")
            lines.append("".join(traceback.format_stack(frame)))
        print("\n".join(lines), file=sys.stderr, flush=True)
        os._exit(self.EXIT_CODE)


def enable(
    default_timeout_s: float = 900.0,
    *,
    label: str = "run",
    initial_grace_s: Optional[float] = None,
) -> Optional[StallWatchdog]:
    """CLI entry: start a watchdog unless ``MMOE_STALL_TIMEOUT_S=0``.

    Returns the started watchdog (caller may ignore it — it is a daemon
    thread and registered for module-level :func:`beat`), or ``None`` when
    disabled.
    """
    raw = os.environ.get("MMOE_STALL_TIMEOUT_S")
    timeout = float(raw) if raw not in (None, "") else float(default_timeout_s)
    if timeout <= 0:
        return None
    return StallWatchdog(
        timeout, label=label, initial_grace_s=initial_grace_s
    ).start()
