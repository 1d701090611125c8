"""Shared CLI plumbing: repo-root sys.path setup (run scripts either as
``python -m scripts.x`` or ``python scripts/x.py``, matching the reference's
convention, ref: scripts/add_solar_context_bins.py:38-42)."""

import os
import sys
from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parents[1]
if str(PROJECT_ROOT) not in sys.path:
    sys.path.insert(0, str(PROJECT_ROOT))

# MMOE_PLATFORM=cpu|tpu overrides the backend (the environment's site startup
# pins jax_platforms to the TPU tunnel, ignoring JAX_PLATFORMS).
_platform = os.environ.get("MMOE_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)

# Persistent XLA compile cache: large detector graphs take minutes to compile
# on a slow host; cached executables make reruns/resumes start in seconds.
# MMOE_XLA_CACHE='' disables.
_xla_cache = os.environ.get("MMOE_XLA_CACHE", "~/.cache/mmoe/xla_cache")
if _xla_cache:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(Path(_xla_cache).expanduser())
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
