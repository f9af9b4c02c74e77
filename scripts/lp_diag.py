"""Diagnose the batched-LP tier's on-tier failures (VERDICT r4 #4).

Runs solve_batch_lp_pallas_jit at the suite shape (B=256, n=10, m=50)
and reports, for every lane that is non-optimal OR inaccurate against
the constructed vertex solution: exit flag, outer-loop eps at exit,
active count, objective gap, feasibility violation — the evidence
needed to pick the fix (per-lane eps caps / extra crossover rounds /
f64 islands).

Usage: python scripts/lp_diag.py [B] [--cpu]
"""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')

cpu = '--cpu' in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith('--')]

import jax
if cpu:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_lp

B = int(args[0]) if args else 256
n, m, ms = 10, 50, 0
rng = np.random.default_rng(17)
probs = [generate_test_lp(n, m, ms, rng) for _ in range(B)]
xs_ref = np.stack([p[0] for p in probs])
fs = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
As = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
bus = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
bls = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float32)
se = jnp.zeros((B, m), jnp.int32)
stl = _as_settings({"iter_limit": 3000}, jnp.float32)

res = batch_mod.solve_batch_lp_pallas_jit(fs, As, bus, bls, se, stl,
                                          ms=ms, interpret=cpu)
x = np.asarray(res.x)
flags = np.asarray(res.exitflag)
iters = np.asarray(res.iterations)

fv_ref = np.einsum('bn,bn->b', np.asarray(fs), xs_ref)
fv_got = np.einsum('bn,bn->b', np.asarray(fs), x)
gap = np.abs(fv_got - fv_ref) / (1.0 + np.abs(fv_ref))
Ax = np.einsum('bmn,bn->bm', np.asarray(As), x)
feas = np.maximum((Ax - np.asarray(bus)).max(axis=1),
                  (np.asarray(bls) - Ax).max(axis=1))
feas = np.maximum(feas, 0.0)
ok = (flags == 1) & (gap < 1e-4) & (feas < 1e-4)
print(f"B={B}: optimal {int((flags == 1).sum())}/{B}, "
      f"accurate {int(ok.sum())}/{B}")
print(f"gap: med {np.median(gap):.2e} p99 {np.percentile(gap, 99):.2e} "
      f"max {gap.max():.2e}")
print(f"feas: med {np.median(feas):.2e} max {feas.max():.2e}")
bad = np.where(~ok)[0]
for b in bad[:40]:
    print(f"  lane {b}: flag={flags[b]} iters={iters[b]} "
          f"gap={gap[b]:.3e} feas={feas[b]:.3e} "
          f"xerr={np.abs(x[b] - xs_ref[b]).max():.3e}")
