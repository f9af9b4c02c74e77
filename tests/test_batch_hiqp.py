"""Batched hierarchical tier (batch.solve_batch_hiqp_pallas_jit): the
daqp_hiqp level walk (hierarchical.c:5-108) carried by one unrolled loop
over the whole-batch dense-mask kernel state — differential vs the
single-instance ``hiqp_core`` (itself differential-tested against the
hierarchical oracle)."""
import numpy as np
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings


def _rand_hier(rng, n, bp):
    m = bp[-1]
    A = rng.standard_normal((m, n))
    x0 = rng.standard_normal(n)
    b = A @ x0
    bu = b + 0.2 * rng.random(m)
    bl = b - 1.2 - 0.5 * rng.random(m)
    # make some level-1 rows conflict so slacks are exercised
    bu[:2] = b[:2] - 0.5
    bl[:2] = bu[:2] - 1.0
    return A, bu, bl


def test_batch_hiqp_differential():
    rng = np.random.default_rng(77)
    B, n = 16, 8
    bp = (0, 6, 12, 18)
    m = bp[-1]
    As = np.empty((B, m, n)); bus = np.empty((B, m)); bls = np.empty((B, m))
    fs = np.zeros((B, n))
    for b in range(B):
        As[b], bus[b], bls[b] = _rand_hier(rng, n, bp)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 2000}, jnp.float32)
    res = batch_mod.solve_batch_hiqp_pallas_jit(
        None, jnp.asarray(fs, jnp.float32), jnp.asarray(As, jnp.float32),
        jnp.asarray(bus, jnp.float32), jnp.asarray(bls, jnp.float32),
        jnp.asarray(sense), st, ms=0, break_points=bp, interpret=True)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    lams = np.asarray(res.lam)
    assert (flags > 0).all(), np.unique(flags)
    # differential vs the single-instance hierarchical solver, at the
    # SAME finite rho_soft/tolerances (the hierarchical solution is an
    # exact-penalty approximation whose violations scale with rho —
    # comparing f32-default rho 1e-4 against f64-default 1e-6 compares
    # two different approximations)
    match = {"rho_soft": max(float(st.rho_soft), 3e-2),
             "primal_tol": float(st.primal_tol)}
    nbad = 0
    for b in range(B):
        one = daqp_tpu.quadprog(
            None, fs[b], As[b], bus[b], bls[b], sense[b], ms=0,
            break_points=bp, settings=match)
        assert int(one.exitflag) > 0, (b, int(one.exitflag))
        dx = np.abs(xs[b] - np.asarray(one.x)).max()
        dl = np.abs(lams[b] - np.asarray(one.lam)).max()
        if dx > 5e-4 or dl > 5e-4:
            nbad += 1
    # lexicographic optima are unique for generic data; allow a small
    # f32-vs-f64 tie-breaking tail
    assert nbad <= 1, nbad


def test_batch_hiqp_infeasible_level_slacks():
    # a level whose constraints conflict must report nonzero slack duals
    # for exactly the violated rows and still solve lower levels
    rng = np.random.default_rng(5)
    B, n = 8, 6
    bp = (0, 4, 8)
    m = bp[-1]
    As = rng.standard_normal((B, m, n))
    x0 = rng.standard_normal((B, n))
    b0 = np.einsum('bmn,bn->bm', As, x0)
    bus = b0 + 0.5
    bls = b0 - 0.5
    # level 1 rows 0/1: same row, disjoint bands -> guaranteed conflict
    As[:, 1] = As[:, 0]
    bus[:, 0] = b0[:, 0] - 1.0
    bls[:, 0] = b0[:, 0] - 2.0
    bls[:, 1] = b0[:, 1] + 1.0
    bus[:, 1] = b0[:, 1] + 2.0
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 2000}, jnp.float32)
    res = batch_mod.solve_batch_hiqp_pallas_jit(
        None, jnp.zeros((B, n), jnp.float32), jnp.asarray(As, jnp.float32),
        jnp.asarray(bus, jnp.float32), jnp.asarray(bls, jnp.float32),
        jnp.asarray(sense), st, ms=0, break_points=bp, interpret=True)
    flags = np.asarray(res.exitflag)
    lams = np.asarray(res.lam)
    assert (flags > 0).all(), np.unique(flags)
    # the conflicting pair carries the level's slack duals
    assert (np.abs(lams[:, :2]).max(axis=1) > 1e-6).all()
    match = {"rho_soft": max(float(st.rho_soft), 3e-2),
             "primal_tol": float(st.primal_tol)}
    for b in range(0, B, 3):
        one = daqp_tpu.quadprog(None, np.zeros(n), As[b], bus[b], bls[b],
                                sense[b], ms=0, break_points=bp,
                                settings=match)
        assert int(one.exitflag) > 0
        dx = np.abs(np.asarray(res.x)[b] - np.asarray(one.x)).max()
        assert dx < 5e-4, (b, dx)


def test_batch_hiqp_full_tile_accounted():
    # VERDICT r4 #5: full 128-lane tile with every lane accounted —
    # flags must be OPTIMAL or the loud DOF exit (3), never silent,
    # and a stride of lanes is differentially checked vs the
    # single-instance walk at matched rho
    rng = np.random.default_rng(91)
    B, n = 128, 10
    bp = (0, 7, 14, 21)
    m = bp[-1]
    As = np.empty((B, m, n)); bus = np.empty((B, m)); bls = np.empty((B, m))
    fs = np.zeros((B, n))
    for b in range(B):
        As[b], bus[b], bls[b] = _rand_hier(rng, n, bp)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 3000}, jnp.float32)
    res = batch_mod.solve_batch_hiqp_pallas_jit(
        None, jnp.asarray(fs, jnp.float32), jnp.asarray(As, jnp.float32),
        jnp.asarray(bus, jnp.float32), jnp.asarray(bls, jnp.float32),
        jnp.asarray(sense), st, ms=0, break_points=bp, interpret=True)
    flags = np.asarray(res.exitflag)
    assert np.isin(flags, (1, 3)).all(), np.unique(flags,
                                                   return_counts=True)
    match = {"rho_soft": 3e-2, "primal_tol": float(st.primal_tol),
             "iter_limit": 3000}
    nbad = 0
    for b in range(0, B, 11):
        one = daqp_tpu.quadprog(None, fs[b], As[b], bus[b], bls[b],
                                sense[b], ms=0, break_points=bp,
                                settings=match)
        assert int(one.exitflag) > 0, b
        if np.abs(np.asarray(res.x)[b] - np.asarray(one.x)).max() > 2e-3:
            nbad += 1
    assert nbad <= 1, nbad


def test_batch_hiqp_backstop():
    # negative-flag lanes escalate through the f64 single-instance walk
    # (injected failure; exit 3 = DOF exhausted is semantic, untouched)
    rng = np.random.default_rng(53)
    B, n = 8, 8
    bp = (0, 6, 12, 18)
    m = bp[-1]
    As = np.empty((B, m, n)); bus = np.empty((B, m)); bls = np.empty((B, m))
    fs = np.zeros((B, n))
    for b in range(B):
        As[b], bus[b], bls[b] = _rand_hier(rng, n, bp)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 2000}, jnp.float32)
    res = batch_mod.solve_batch_hiqp_pallas_jit(
        None, jnp.asarray(fs, jnp.float32), jnp.asarray(As, jnp.float32),
        jnp.asarray(bus, jnp.float32), jnp.asarray(bls, jnp.float32),
        jnp.asarray(sense), st, ms=0, break_points=bp, interpret=True)
    flags = np.asarray(res.exitflag).copy()
    flags[2] = -4                       # injected failure
    x_bad = np.asarray(res.x).copy()
    x_bad[2] = np.nan
    injected = res._replace(exitflag=jnp.asarray(flags, jnp.int32),
                            x=jnp.asarray(x_bad))
    rep = batch_mod.backstop_resolve_hiqp(
        injected, None, fs, As, bus, bls, sense, ms=0, break_points=bp,
        settings={"rho_soft": 3e-2})
    flags2 = np.asarray(rep.exitflag)
    assert flags2[2] > 0, flags2
    assert np.isfinite(np.asarray(rep.x)[2]).all()
