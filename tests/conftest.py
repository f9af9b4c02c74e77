"""Test configuration: CPU backend with 8 virtual devices and float64.

Correctness tests run in double precision on the local CPU backend (the
reference accuracy contract assumes f64); the 8 virtual devices back the
sharding tests.  TPU benchmarking is exercised separately by ``bench.py``.

NOTE: pytest plugins may import jax before this conftest runs, so the
platform override must go through ``jax.config.update`` (which works until
backends are initialized), not through JAX_PLATFORMS — the ambient
environment points that at a tunneled TPU (axon).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the while_loop-heavy solvers are slow to
# compile; cache across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", jax.default_backend()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
