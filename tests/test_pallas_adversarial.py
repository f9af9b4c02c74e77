"""Pallas kernel path on adversarial batches (interpret mode): mixed
feasible / infeasible / equality / degenerate lanes in one batch."""
import numpy as np

import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp_batch


def test_pallas_mixed_batch():
    B, n, m = 128, 10, 24
    d = generate_test_qp_batch(B, n, m, 0, 6, 1e2, rng=11,
                               dtype=np.float32)
    bu = d['bupper'].copy()
    bl = d['blower'].copy()
    sense = d['sense'].copy()
    # lanes 0-9: geometrically infeasible (row0 <= -1 while row0 dup >= 1)
    A = d['A'].copy()
    for b in range(10):
        A[b][1] = A[b][0]
        bu[b][0], bl[b][0] = -1.0, -30.0
        bu[b][1], bl[b][1] = 30.0, 1.0
    # lanes 10-19: two equality rows (auto-detected ACTIVE+IMMUTABLE)
    for b in range(10, 20):
        mid = 0.5 * (bu[b][2] + bl[b][2])
        bu[b][2] = bl[b][2] = mid
    # lanes 20-29: duplicated rows (degenerate geometry)
    for b in range(20, 30):
        A[b][3] = A[b][4]
        bu[b][3] = bu[b][4]
        bl[b][3] = bl[b][4]
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    res = batch_mod.solve_batch_pallas_jit(
        jnp.asarray(d['H']), jnp.asarray(d['f']), jnp.asarray(A),
        jnp.asarray(bu), jnp.asarray(bl), jnp.asarray(sense),
        st=st, ms=0, interpret=True)
    flags = np.asarray(res.exitflag)
    assert np.all(flags[:10] == daqp_tpu.EXIT_INFEASIBLE), flags[:10]
    # per-lane expectation from the f64 single-instance solver (forcing a
    # row to its midpoint can make a lane genuinely infeasible)
    for b in range(10, 30):
        ref = daqp_tpu.quadprog(d['H'][b].astype(np.float64),
                                d['f'][b].astype(np.float64),
                                A[b].astype(np.float64),
                                bu[b].astype(np.float64),
                                bl[b].astype(np.float64), ms=0)
        assert int(flags[b]) == int(ref.exitflag), (b, int(flags[b]))
        if int(ref.exitflag) == 1:
            assert np.linalg.norm(np.asarray(res.x)[b]
                                  - np.asarray(ref.x)) < 2e-3, b
    assert np.all(flags[30:] == daqp_tpu.EXIT_OPTIMAL)
    err = np.linalg.norm(np.asarray(res.x)[30:] - d['x'][30:], axis=1)
    assert err.max() < 2e-3, err.max()
    # equality lanes respect their equalities
    for b in range(10, 20):
        if int(flags[b]) == 1:
            assert abs(float(A[b][2] @ np.asarray(res.x)[b])
                       - bu[b][2]) < 1e-3


def test_pallas_soft_batch():
    # soft-constraint lanes through the kernel path: conflicting soft
    # equality vs hard bound -> SOFT_OPTIMAL with the hard bound held
    B, n = 128, 8
    rng = np.random.default_rng(19)
    Q = rng.standard_normal((B, n, n)).astype(np.float32)
    H = np.einsum('bij,bkj->bik', Q, Q) + np.eye(n, dtype=np.float32)
    f = np.zeros((B, n), np.float32)
    A = np.tile(np.eye(n, dtype=np.float32)[None], (B, 1, 1))
    A = np.concatenate([A, A[:, :1]], axis=1)          # extra soft row
    bu = np.concatenate([np.zeros((B, 1)), np.full((B, n - 1), 10.0),
                         np.full((B, 1), 1e30)],
                        axis=1).astype(np.float32)     # x1 <= 0 hard
    bl = np.concatenate([np.full((B, n), -10.0), np.ones((B, 1))],
                        axis=1).astype(np.float32)     # soft x1 >= 1
    sense = np.zeros((B, n + 1), np.int32)
    sense[:, n] = daqp_tpu.SOFT
    st = _as_settings({"iter_limit": 200}, jnp.float32)
    res = batch_mod.solve_batch_pallas_jit(
        jnp.asarray(H), jnp.asarray(f), jnp.asarray(A), jnp.asarray(bu),
        jnp.asarray(bl), jnp.asarray(sense), st=st, ms=0, interpret=True,
        has_soft=True)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == daqp_tpu.EXIT_SOFT_OPTIMAL), \
        np.unique(flags, return_counts=True)
    x = np.asarray(res.x)
    assert np.all(x[:, 0] <= 1e-4), x[:, 0].max()      # hard bound held
    assert np.all(np.asarray(res.soft_slack) > 0)
