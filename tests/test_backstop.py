"""f32 outlier backstop: non-optimal / KKT-failing lanes of a batched
solve are re-solved through the f64 NumPy oracle (full reference
semantics), so a batch never silently returns a bad lane."""
import numpy as np
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp_batch


def test_backstop_repairs_iterlimit_lanes():
    B = 8
    d = generate_test_qp_batch(B, 12, 40, 0, 8, 1e2, rng=5)
    st = _as_settings({"iter_limit": 3}, jnp.float64)   # force failures
    args = tuple(jnp.asarray(d[k]) for k in
                 ('H', 'f', 'A', 'bupper', 'blower', 'sense'))
    res = batch_mod.solve_batch_flat_jit(*args, st, ms=0)
    flags = np.asarray(res.exitflag)
    assert np.any(flags != daqp_tpu.EXIT_OPTIMAL), flags  # some failed

    fixed = batch_mod.backstop_resolve(res, d['H'], d['f'], d['A'],
                                       d['bupper'], d['blower'],
                                       d['sense'], ms=0)
    assert np.all(np.asarray(fixed.exitflag) == daqp_tpu.EXIT_OPTIMAL)
    err = np.linalg.norm(np.asarray(fixed.x) - d['x'], axis=1)
    assert err.max() < 1e-6, err.max()


def test_backstop_catches_silent_kkt_failures():
    # corrupt one lane's primal answer but keep its OPTIMAL flag: the
    # flag check alone would miss it; the KKT residual gate must not
    B = 8
    d = generate_test_qp_batch(B, 10, 30, 0, 6, 1e2, rng=6)
    st = _as_settings(None, jnp.float64)
    args = tuple(jnp.asarray(d[k]) for k in
                 ('H', 'f', 'A', 'bupper', 'blower', 'sense'))
    res = batch_mod.solve_batch_flat_jit(*args, st, ms=0)
    x = np.asarray(res.x).copy()
    x[3] += 0.05                                     # silent corruption
    res = res._replace(x=jnp.asarray(x))

    fixed = batch_mod.backstop_resolve(res, d['H'], d['f'], d['A'],
                                       d['bupper'], d['blower'],
                                       d['sense'], ms=0)
    err = np.linalg.norm(np.asarray(fixed.x) - d['x'], axis=1)
    assert err.max() < 1e-6, err.max()


def test_backstop_noop_on_clean_batch():
    B = 4
    d = generate_test_qp_batch(B, 10, 30, 0, 6, 1e2, rng=7)
    st = _as_settings(None, jnp.float64)
    args = tuple(jnp.asarray(d[k]) for k in
                 ('H', 'f', 'A', 'bupper', 'blower', 'sense'))
    res = batch_mod.solve_batch_flat_jit(*args, st, ms=0)
    fixed = batch_mod.backstop_resolve(res, d['H'], d['f'], d['A'],
                                       d['bupper'], d['blower'],
                                       d['sense'], ms=0)
    assert fixed is res                              # literally untouched
