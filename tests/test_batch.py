"""Batched (vmapped) solve: correctness vs constructed solutions and vs the
single-instance path."""
import numpy as np

import daqp_tpu
from daqp_tpu import batch as batch_mod
from tests.gen import generate_test_qp_batch


def test_solve_batch_correct():
    B, n, m, ms, nact = 16, 20, 50, 5, 12
    d = generate_test_qp_batch(B, n, m, ms, nact, 1e2, rng=99)
    res = batch_mod.solve_batch(d['H'], d['f'], d['A'], d['bupper'],
                                d['blower'], d['sense'], ms=ms)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == daqp_tpu.EXIT_OPTIMAL), flags
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    assert err.max() < 1e-4, err.max()


def test_sorted_stream_matches_and_restores_order():
    # the headline path (round 5): one-dispatch streaming solve with the
    # GLOBAL difficulty sort — outputs must come back in input order and
    # match the per-call kernel tier lane-for-lane
    import jax.numpy as jnp
    B, n, m, ms = 96, 10, 24, 4
    d = generate_test_qp_batch(B, n, m, ms, 8, 1e2, rng=31)
    args = [jnp.asarray(d[k]) for k in
            ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
    res = batch_mod.solve_batch_pallas_stream_jit(
        *args, st=_st(), ms=ms, chunk=32, interpret=True,
        sort_stream=True)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == daqp_tpu.EXIT_OPTIMAL), flags
    err = np.linalg.norm(np.asarray(res.x) - d['x'], axis=1)
    assert err.max() < 1e-4, err.max()
    # non-chunk-multiple B exercises pad + sort together
    res2 = batch_mod.solve_batch_pallas_stream_jit(
        *[a[:50] for a in args], st=_st(), ms=ms, chunk=32,
        interpret=True, sort_stream=True)
    assert np.allclose(np.asarray(res2.x), np.asarray(res.x)[:50],
                       atol=1e-10)


def _st():
    import jax.numpy as jnp
    from daqp_tpu.api import _as_settings
    return _as_settings({"iter_limit": 500}, jnp.float64)


def test_batch_matches_single():
    B = 4
    d = generate_test_qp_batch(B, 10, 30, 0, 6, 1e2, rng=5)
    res = batch_mod.solve_batch(d['H'], d['f'], d['A'], d['bupper'],
                                d['blower'], d['sense'], ms=0)
    for b in range(B):
        r1 = daqp_tpu.quadprog(d['H'][b], d['f'][b], d['A'][b],
                               d['bupper'][b], d['blower'][b],
                               d['sense'][b], ms=0)
        assert np.allclose(np.asarray(res.x)[b], np.asarray(r1.x), atol=1e-8)
        assert np.isclose(float(res.fval[b]), float(r1.fval), atol=1e-8)
