"""Test configuration: CPU backend with 8 virtual devices and float64.

Correctness tests run in double precision on CPU (the reference accuracy
contract assumes f64); the 8 virtual devices back the sharding tests.
TPU benchmarking is exercised separately by ``bench.py``.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
