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
