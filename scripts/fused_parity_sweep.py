"""Chip parity sweep: the fused outer-loop tiers vs their XLA twins at
shapes beyond the smoke/bench defaults (bigger n/m, ms > 0, PD/
semidefinite mixes).  Round-5 findings (v5e):

  * prox: PD lanes exact both paths; heavily rank-deficient H at
    tight constructed bounds (kappa ~ 1e7 after the 1e-6 shift) exits
    LOUD (-1) identically on BOTH paths — an f32 conditioning edge of
    the tier, not a fused regression (raise eps_prox or use the f64
    single path for that regime).
  * AVI: n=20/m=50 fused 1.0 vs XLA 0.988; n=40/m=90 BOTH paths 0.906
    with the same 16 loud lanes (tier edge, path-consistent); ms > 0
    parity at 0.97/0.97.

Usage: python scripts/fused_parity_sweep.py
"""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp_batch, generate_test_avi_two_sided

st = _as_settings({"iter_limit": 2000}, jnp.float32)

for (B, n, m, ms, rank) in ((256, 30, 80, 10, 18), (128, 64, 120, 0, 40)):
    rng = np.random.default_rng(100 + n)
    d = generate_test_qp_batch(B, n, m, ms, max(4, n // 3), 1e2,
                               rng=100 + n, dtype=np.float32)
    Q = rng.standard_normal((B // 2, n, rank)).astype(np.float32)
    Hs = d['H'].copy()
    Hs[:B // 2] = np.einsum('bir,bjr->bij', Q, Q)
    args = (jnp.asarray(Hs), jnp.asarray(d['f']), jnp.asarray(d['A']),
            jnp.asarray(d['bupper']), jnp.asarray(d['blower']),
            jnp.asarray(d['sense']))
    for name, fused in (("xla", False), ("fused", True)):
        r = batch_mod.solve_batch_prox_pallas_jit(*args, st, ms=ms,
                                                  fused=fused)
        fl = np.asarray(r.exitflag)
        errk = np.linalg.norm(np.asarray(r.x)[B // 2:]
                              - d['x'][B // 2:], axis=1)
        print(f"prox n={n} m={m} ms={ms} {name}: flags "
              f"{dict(zip(*np.unique(fl, return_counts=True)))} "
              f"PD-err {errk.max():.2e}", flush=True)

for (B, n, m, ms) in ((256, 40, 90, 0), (128, 16, 40, 6)):
    rng = np.random.default_rng(200 + n)
    probs = [generate_test_avi_two_sided(n, m - ms, rng)
             for _ in range(B)]
    xs = np.stack([p[0] for p in probs])
    Hs = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
    fs = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
    As = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
    bug = np.stack([p[4] for p in probs])
    blg = np.stack([p[5] for p in probs])
    if ms:
        bus = np.concatenate([xs[:, :ms] + 5.0, bug], axis=1)
        bls = np.concatenate([xs[:, :ms] - 5.0, blg], axis=1)
    else:
        bus, bls = bug, blg
    se = jnp.zeros((B, m), jnp.int32)
    for name, fused in (("xla", False), ("fused", True)):
        r = batch_mod.solve_batch_avi_pallas_jit(
            Hs, fs, As, jnp.asarray(bus, jnp.float32),
            jnp.asarray(bls, jnp.float32), se, st, ms=ms, fused=fused)
        fl = np.asarray(r.exitflag)
        err = np.abs(np.asarray(r.x) - xs).max(axis=1)
        ok = (fl == 1) & (err < 1e-3)
        print(f"avi n={n} m={m} ms={ms} {name}: flags "
              f"{dict(zip(*np.unique(fl, return_counts=True)))} "
              f"acc {ok.mean():.4f}", flush=True)
