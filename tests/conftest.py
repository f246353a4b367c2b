"""Test configuration: run everything on a faked 8-device CPU mesh.

The driver validates multi-chip sharding the same way (SURVEY.md §4.4); real TPU
benchmarking happens in bench.py, not in tests.

NOTE: this environment auto-registers an `axon` TPU PJRT plugin via
sitecustomize and sets JAX_PLATFORMS=axon; `jax.config.update("jax_platforms",
"cpu")` after import is the reliable way to force CPU (env vars alone are
overridden by the plugin registration).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: repeated pytest runs skip recompiles.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 weak #5: 23 min/iteration on the 1-core host needs
# a fast subset).  Markers are assigned automatically:
#
#   core     — every test whose recorded duration (tests/durations.json,
#              regenerate with `pytest --durations=0` and the helper in
#              CLAUDE.md) is under SLOW_THRESHOLD_S and which isn't in a
#              mesh-centric module.  `pytest -m core` ≈ 3-4 min.
#   slow     — recorded duration >= SLOW_THRESHOLD_S (or explicitly marked).
#   parallel — mesh/sharding modules (also useful to -m select alone).
#
# Unknown tests (new, not yet in durations.json) default to core so new
# regressions run in the fast tier until re-timed.
# ---------------------------------------------------------------------------

import json as _json

import pytest as _pytest

SLOW_THRESHOLD_S = 4.0
PARALLEL_MODULES = (
    "test_parallel", "test_pipeline", "test_sequence_parallel",
    "test_zero1", "test_fsdp", "test_moe", "test_checkpoint_sharded",
)

_dur_path = os.path.join(os.path.dirname(__file__), "durations.json")
try:
    with open(_dur_path) as _f:
        _DURATIONS = _json.load(_f)
except OSError:
    _DURATIONS = {}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        is_parallel = mod in PARALLEL_MODULES
        if is_parallel:
            item.add_marker(_pytest.mark.parallel)
        recorded = _DURATIONS.get(item.nodeid)
        is_slow = (item.get_closest_marker("slow") is not None
                   or (recorded is not None and recorded >= SLOW_THRESHOLD_S))
        if is_slow:
            item.add_marker(_pytest.mark.slow)
        if not is_slow and not is_parallel:
            item.add_marker(_pytest.mark.core)
