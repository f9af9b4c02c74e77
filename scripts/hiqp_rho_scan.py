"""rho_soft floor scan for the batched hierarchical tier (VERDICT r4 #8).

Reproduces the measurement behind the documented f32 floor ("51/128
INFEASIBLE lanes at rho 1e-4" before the between-level Newton refresh):
a 3-level B=128 hierarchy, rho swept down from 3e-2, counting failed
lanes and the differential error vs the f64 single-instance ``hiqp_core``
at MATCHING rho.

Usage: python scripts/hiqp_rho_scan.py [--cpu] [rhos...]
"""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
cpu = '--cpu' in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith('--')]

import jax
if cpu:
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings

B, n = 128, 12
bp = (0, 8, 16, 24)
m = bp[-1]
rng = np.random.default_rng(19)
As = rng.standard_normal((B, m, n)).astype(np.float32)
x0 = rng.standard_normal((B, n)).astype(np.float32)
b0 = np.einsum('bmn,bn->bm', As, x0)
bus = (b0 + 0.2 * rng.random((B, m))).astype(np.float32)
bls = (b0 - 1.2 - 0.5 * rng.random((B, m))).astype(np.float32)
As[:, 1] = As[:, 0]
bus[:, 0] = b0[:, 0] - 1.0
bls[:, 0] = b0[:, 0] - 2.0
bls[:, 1] = b0[:, 1] + 1.0
bus[:, 1] = b0[:, 1] + 2.0
sense = np.zeros((B, m), np.int32)
fs = np.zeros((B, n), np.float32)

rhos = [float(r) for r in args] if args else [3e-2, 1e-2, 1e-3, 1e-4]
for rho in rhos:
    st = _as_settings({"iter_limit": 2000, "rho_soft": rho}, jnp.float32)
    out = batch_mod.solve_batch_hiqp_pallas_jit(
        None, jnp.asarray(fs), jnp.asarray(As), jnp.asarray(bus),
        jnp.asarray(bls), jnp.asarray(sense), st, ms=0,
        break_points=bp, interpret=cpu, rho_floor=rho)
    flags = np.asarray(out.exitflag)
    bad = int((flags <= 0).sum())
    # differential vs the f64 single-instance level walk at the same rho
    errs = []
    match = {"rho_soft": rho, "primal_tol": float(st.primal_tol),
             "iter_limit": 2000}
    for b in range(0, B, 17):
        if flags[b] <= 0:
            continue
        ref = daqp_tpu.quadprog(None, fs[b], As[b], bus[b], bls[b],
                                sense[b], ms=0, break_points=bp,
                                settings=match)
        if int(ref.exitflag) <= 0:
            continue
        errs.append(float(np.max(np.abs(np.asarray(out.x)[b]
                                        - np.asarray(ref.x)))))
    print(f"rho={rho:g}: failed {bad}/{B} "
          f"(flags {dict(zip(*np.unique(flags, return_counts=True)))}) "
          f"diff-vs-hiqp_core max {max(errs) if errs else float('nan'):.2e}",
          flush=True)
