"""Flat (slot-based) batched solver: correctness vs constructed solutions
and vs the single-instance path, including the chunked lax.map path."""
import numpy as np

import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp_batch


def _solve_flat(d, ms=0, **st_over):
    st = _as_settings(st_over or None, jnp.float64)
    return batch_mod.solve_batch_flat_jit(
        jnp.asarray(d['H']), jnp.asarray(d['f']), jnp.asarray(d['A']),
        jnp.asarray(d['bupper']), jnp.asarray(d['blower']),
        jnp.asarray(d['sense']), st, ms=ms)


def test_flat_batch_correct():
    B, n, m, ms, nact = 32, 20, 50, 5, 12
    d = generate_test_qp_batch(B, n, m, ms, nact, 1e2, rng=99)
    res = _solve_flat(d, ms=ms)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == daqp_tpu.EXIT_OPTIMAL), flags
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    assert err.max() < 1e-6, err.max()


def test_flat_batch_chunked():
    # exercises the lax.map chunking path (B > lane_chunk)
    B = 24
    d = generate_test_qp_batch(B, 10, 30, 0, 6, 1e2, rng=7)
    st = _as_settings(None, jnp.float64)
    res = batch_mod.solve_batch_flat_jit(
        jnp.asarray(d['H']), jnp.asarray(d['f']), jnp.asarray(d['A']),
        jnp.asarray(d['bupper']), jnp.asarray(d['blower']),
        jnp.asarray(d['sense']), st, ms=0, lane_chunk=8)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == daqp_tpu.EXIT_OPTIMAL), flags
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    assert err.max() < 1e-6, err.max()


def test_flat_matches_ordered_solver():
    B = 8
    d = generate_test_qp_batch(B, 12, 40, 0, 8, 1e2, rng=3)
    res = _solve_flat(d, ms=0)
    for b in range(B):
        r1 = daqp_tpu.quadprog(d['H'][b], d['f'][b], d['A'][b],
                               d['bupper'][b], d['blower'][b],
                               d['sense'][b], ms=0)
        assert np.allclose(np.asarray(res.x)[b], np.asarray(r1.x),
                           atol=1e-9)
        assert np.isclose(float(res.fval[b]), float(r1.fval), atol=1e-9)


def test_flat_batch_dual_kkt():
    # duals scattered back satisfy stationarity H x + f + A' lam = 0
    B = 8
    d = generate_test_qp_batch(B, 15, 40, 0, 10, 1e2, rng=13)
    res = _solve_flat(d, ms=0)
    for b in range(B):
        lam = np.asarray(res.lam)[b]
        grad = d['H'][b] @ np.asarray(res.x)[b] + d['f'][b] \
            + d['A'][b].T @ lam
        assert np.linalg.norm(grad) < 1e-6
