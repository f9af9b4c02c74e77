"""Pallas mega-kernel path (interpret mode on CPU): correctness vs
constructed solutions and vs the ordered solver."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp_batch


def test_pallas_kernel_interpret_correct():
    B, n, m, ms, nact = 128, 20, 40, 0, 12
    d = generate_test_qp_batch(B, n, m, ms, nact, 1e2, rng=5,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    res = batch_mod.solve_batch_pallas_jit(
        *[jnp.asarray(d[k]) for k in
          ('H', 'f', 'A', 'bupper', 'blower', 'sense')],
        st=st, ms=ms, interpret=True)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == daqp_tpu.EXIT_OPTIMAL), \
        np.unique(flags, return_counts=True)
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    assert err.max() < 2e-3, err.max()
    # dual feasibility/stationarity through the returned multipliers
    b0 = 0
    lam = np.asarray(res.lam)[b0]
    grad = d['H'][b0] @ np.asarray(res.x)[b0] + d['f'][b0] \
        + d['A'][b0].T @ lam
    assert np.linalg.norm(grad) < 5e-3, np.linalg.norm(grad)


def test_dense_kernel_bland_pricing():
    # Settings.pricing = 1 (Bland, lowest violated index) on the
    # dense-mask kernel: must agree with Dantzig on strictly convex
    # soft batches (unique optimum).  Also the regression fixture for
    # the relative add-pivot gate: before it, one Bland trajectory
    # exited OPTIMAL with x 5.8e-2 off through a ~1e-6 f32 Schur pivot.
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    from daqp_tpu.types import SOFT
    from tests.gen import generate_test_qp_batch

    B, n, m = 128, 8, 20
    d = generate_test_qp_batch(B, n, m, 0, 5, 1e2, rng=2,
                               dtype=np.float32)
    sense = d['sense'].copy()
    sense[:, :4] |= SOFT
    args = [jnp.asarray(v) for v in
            (d['H'], d['f'], d['A'], d['bupper'], d['blower'],
             jnp.asarray(sense))]
    xs = {}
    for pr in (0, 1):
        st = _as_settings({"pricing": pr, "iter_limit": 600},
                          jnp.float32)
        r = batch_mod.solve_batch_pallas_jit(*args, st=st, ms=0,
                                             has_soft=True,
                                             interpret=True)
        xs[pr] = (np.asarray(r.exitflag), np.asarray(r.x))
    ok = (xs[0][0] > 0) & (xs[1][0] > 0)
    assert ok.mean() > 0.95, (np.unique(xs[0][0]), np.unique(xs[1][0]))
    diff = np.abs(xs[0][1][ok] - xs[1][1][ok]).max()
    assert diff < 1e-4, diff
