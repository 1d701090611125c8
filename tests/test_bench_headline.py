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


def test_backend_init_failure_signature():
    assert bench._backend_init_failure(
        RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE: ...")
    )
    assert bench._backend_init_failure(RuntimeError("UNAVAILABLE: TPU setup"))
    assert not bench._backend_init_failure(RuntimeError("shape mismatch"))
