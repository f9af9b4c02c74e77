"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. working-set capacity with soft constraints (K = n + ns + 1,
   api.c:288-305) — no silent slot-0 overwrite on a full table;
2. dependent warm-start activation re-enters pricing (DAQP_SET_INACTIVE,
   auxiliary.c:446-469) + redundant-equality rhs consistency
   (EXIT_OVERDETERMINED_INITIAL);
3/4. Pallas has_soft dispatch: soft batches are auto-routed to the soft
   kernel variant; an explicit hard-only compile flags soft lanes
   EXIT_UNSUPPORTED instead of silently dropping the rows.
"""
import numpy as np
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from daqp_tpu.types import (ACTIVE, IMMUTABLE, LOWER, SOFT,
                            EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL,
                            EXIT_OVERDETERMINED_INITIAL, EXIT_UNSUPPORTED)


def _batchify(*arrays, B=1):
    return [jnp.asarray(np.broadcast_to(a, (B,) + np.asarray(a).shape))
            for a in arrays]


def test_soft_capacity_exceeds_nplus1():
    # n = 2 with four mutually conflicting soft equalities on x0: the
    # optimal active set has 4 soft constraints, exceeding n + 1 = 3.
    n = 2
    H = np.eye(n)
    f = np.zeros(n)
    A = np.array([[1.0, 0.0]] * 4 + [[0.0, 1.0]])
    b = np.array([1.0, 2.0, 3.0, 4.0, 0.0])
    sense = np.array([SOFT] * 4 + [0], np.int32)

    ref = daqp_tpu.quadprog(H, f, A, b, b.copy(), sense, ms=0)
    assert int(ref.exitflag) == EXIT_SOFT_OPTIMAL

    Hb, fb, Ab, bub, blb, sb = _batchify(H, f, A, b, b, sense, B=4)
    res = batch_mod.solve_batch(Hb, fb, Ab, bub, blb, sb, ms=0)
    flags = np.asarray(res.exitflag)
    x = np.asarray(res.x)
    assert np.all(flags == EXIT_SOFT_OPTIMAL), flags
    # x0* = 10 / (4 + rho) ~ 2.5; both paths approximate the large-dual
    # soft system, so compare at the reference accuracy gate
    assert np.abs(x - np.asarray(ref.x)[None]).max() < 1e-4, x

    # Under-allocated K (the old hardcoded n + 1) must never return a
    # silently wrong optimum: either the answer is right or the flag is
    # not optimal.
    st = _as_settings(None, jnp.float64)
    res2 = batch_mod.solve_batch_flat_jit(Hb, fb, Ab, bub, blb, sb, st,
                                          ms=0, K=n + 1)
    flags2 = np.asarray(res2.exitflag)
    x2 = np.asarray(res2.x)
    for b_i in range(4):
        if flags2[b_i] in (EXIT_OPTIMAL, EXIT_SOFT_OPTIMAL):
            assert np.abs(x2[b_i] - np.asarray(ref.x)).max() < 1e-6


def test_dependent_warm_start_reenters_pricing():
    # r2 duplicates r1's row with a TIGHTER bound; both warm-started
    # active.  r2's activation is linearly dependent and dropped — its
    # ACTIVE bit must be cleared so pricing re-enforces it (the old bug
    # returned the r2-violating unconstrained-ish optimum as OPTIMAL).
    H = np.eye(2)
    f = np.array([-3.0, 0.0])
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    bu = np.array([5.0, 1.0])
    bl = np.array([-1e30, -1e30])
    sense = np.array([ACTIVE, ACTIVE], np.int32)

    st = _as_settings(None, jnp.float64)
    Hb, fb, Ab, bub, blb, sb = _batchify(H, f, A, bu, bl, sense, B=2)
    res = batch_mod.solve_batch_flat_jit(Hb, fb, Ab, bub, blb, sb, st,
                                         ms=0)
    flags = np.asarray(res.exitflag)
    x = np.asarray(res.x)
    assert np.all(flags == EXIT_OPTIMAL), flags
    assert np.abs(x - np.array([1.0, 0.0])[None]).max() < 1e-8, x
    # the binding duplicate must be satisfied
    assert np.all(x[:, 0] <= 1.0 + 1e-8)


def test_redundant_equality_consistent_and_not():
    st = _as_settings(None, jnp.float64)
    H = np.eye(2)
    f = np.array([0.0, -1.0])
    A = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])

    # consistent duplicate equality x0 = 1: solvable, x = (1, 1)
    bu = np.array([1.0, 1.0, 1.0])
    bl = np.array([1.0, 1.0, -1e30])
    sense = np.array([ACTIVE | IMMUTABLE, ACTIVE | IMMUTABLE, 0], np.int32)
    Hb, fb, Ab, bub, blb, sb = _batchify(H, f, A, bu, bl, sense, B=2)
    res = batch_mod.solve_batch_flat_jit(Hb, fb, Ab, bub, blb, sb, st,
                                         ms=0)
    assert np.all(np.asarray(res.exitflag) == EXIT_OPTIMAL)
    assert np.abs(np.asarray(res.x)
                  - np.array([1.0, 1.0])[None]).max() < 1e-8

    # inconsistent duplicate equality x0 = 1 vs x0 = 2: overdetermined
    bu2 = np.array([1.0, 2.0, 1.0])
    bl2 = np.array([1.0, 2.0, -1e30])
    Hb, fb, Ab, bub, blb, sb = _batchify(H, f, A, bu2, bl2, sense, B=2)
    res2 = batch_mod.solve_batch_flat_jit(Hb, fb, Ab, bub, blb, sb, st,
                                          ms=0)
    assert np.all(np.asarray(res2.exitflag)
                  == EXIT_OVERDETERMINED_INITIAL), res2.exitflag


def test_pallas_has_soft_autodispatch():
    # one soft row per lane: has_soft=None must route to the soft kernel
    # and agree with the flat path; has_soft=False must flag the lanes.
    H = np.eye(2)
    f = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    bu = np.array([0.0, 1e30, 1.0])
    bl = np.array([-1e30, 1.0, -1e30])
    sense = np.array([0, SOFT, 0], np.int32)

    st = _as_settings(None, jnp.float32)
    Hb, fb, Ab, bub, blb, sb = _batchify(H, f, A, bu, bl, sense, B=128)
    res = batch_mod.solve_batch_pallas_jit(Hb, fb, Ab, bub, blb, sb, st,
                                           ms=0, interpret=True)
    flags = np.asarray(res.exitflag)
    assert np.all(flags == EXIT_SOFT_OPTIMAL), flags
    # soft x >= 1 vs hard x <= 0 with tiny rho: x pinned at the hard bound
    assert np.asarray(res.x)[:, 0].max() <= 1e-5
    assert np.asarray(res.soft_slack).min() > 0

    res2 = batch_mod.solve_batch_pallas_jit(Hb, fb, Ab, bub, blb, sb, st,
                                            ms=0, interpret=True,
                                            has_soft=False)
    assert np.all(np.asarray(res2.exitflag) == EXIT_UNSUPPORTED)
