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

import hashlib

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the while_loop-heavy solvers are slow to
# compile; cache across pytest runs.  The directory is keyed by the
# host's CPU flags: XLA:CPU caches AOT machine code compiled for the
# features of the machine that WROTE the entry, and loading an entry
# from a host with more ISA extensions SIGILLs/segfaults ("Target
# machine feature +prefer-no-scatter is not supported on the host
# machine ... could lead to execution errors such as SIGILL" — observed
# as a segfault inside backend_compile_and_load mid-suite).
try:
    with open("/proc/cpuinfo") as fh:
        _flags_line = next((ln for ln in fh if ln.startswith("flags")), "")
except OSError:
    _flags_line = ""
_cpu_key = hashlib.md5(_flags_line.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", jax.default_backend()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop live compiled executables between test modules.

    The full suite compiles hundreds of large while-loop programs; with
    all of them kept loaded, XLA:CPU deterministically crashes
    (SIGSEGV/SIGABRT inside backend_compile_and_load) while compiling yet
    another program near the end of the run — an accumulation failure,
    not a test bug (every half-suite subset passes; RSS is only ~6 GB of
    125).  Clearing JAX's in-memory caches per module releases the JIT
    allocations; the persistent disk cache keeps reloads cheap."""
    yield
    jax.clear_caches()
