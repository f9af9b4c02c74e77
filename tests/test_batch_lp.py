"""Batched LP tier (batch.solve_batch_lp_pallas_jit): the adaptive-eps
proximal LP regime (daqp_prox.c:21-271) carried by one outer loop over
the whole-batch slot-kernel state — differential vs the single-instance
``linprog`` / the generator's constructed vertex (utils.jl:56-89 port).

The tier is f32 by design (the kernel is f32); the accuracy contract is
the reference benchmark gate ||x - xref|| <= 1e-4 (benchmark.jl:39),
with loud non-optimal lanes escalated through ``backstop_resolve_lp``.
"""
import numpy as np
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_lp


def _make_batch(B, n, m, ms, rng):
    xs, fs, As, bus, bls = [], [], [], [], []
    for _ in range(B):
        x, f, A, bu, bl, _se = generate_test_lp(n, m, ms, rng)
        xs.append(x); fs.append(f); As.append(A)
        bus.append(bu); bls.append(bl)
    return (np.stack(xs), np.stack(fs), np.stack(As), np.stack(bus),
            np.stack(bls))


def test_batch_lp_differential():
    B, n, m, ms = 32, 10, 50, 0
    rng = np.random.default_rng(3)
    xs, fs, As, bus, bls = _make_batch(B, n, m, ms, rng)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 3000}, jnp.float32)
    res = batch_mod.solve_batch_lp_pallas_jit(
        jnp.asarray(fs, jnp.float32), jnp.asarray(As, jnp.float32),
        jnp.asarray(bus, jnp.float32), jnp.asarray(bls, jnp.float32),
        jnp.asarray(sense), st, ms=ms, interpret=True)
    flags = np.asarray(res.exitflag)
    # the tier itself must solve the bulk of the batch; the backstop is
    # for outliers, not a laundering path
    assert np.mean(flags == 1) >= 0.9, np.unique(flags, return_counts=True)
    ok = flags == 1
    err = np.abs(np.asarray(res.x) - xs).max(axis=1)
    assert err[ok].max() < 1e-4, err[ok].max()
    # objective + dual stationarity on solved lanes
    for b in np.flatnonzero(ok)[::7]:
        fv = float(np.asarray(res.fval)[b])
        assert abs(fv - fs[b] @ xs[b]) < 1e-4 * (1 + abs(fv)), b
        lam = np.asarray(res.lam)[b]
        stat = np.abs(fs[b] + As[b].T @ lam).max()
        assert stat < 5e-4, (b, stat)
    # loud lanes escalate through the f64 single-instance solver
    rep = batch_mod.backstop_resolve_lp(res, fs, As, bus, bls, sense,
                                        ms=ms)
    flags2 = np.asarray(rep.exitflag)
    assert (flags2 == 1).all(), np.unique(flags2)
    err2 = np.abs(np.asarray(rep.x) - xs).max(axis=1)
    assert err2.max() < 1e-4, err2.max()
    # single-lane differential vs linprog (same data, f64)
    for b in range(0, B, 11):
        one = daqp_tpu.linprog(fs[b], As[b], bus[b], bls[b], ms=ms)
        assert int(one.exitflag) == 1
        assert np.abs(np.asarray(rep.x)[b]
                      - np.asarray(one.x)).max() < 2e-4, b


def test_batch_lp_unbounded_lane():
    # one lane with an unbounded ray among bounded ones
    B, n, m, ms = 8, 6, 20, 0
    rng = np.random.default_rng(9)
    xs, fs, As, bus, bls = _make_batch(B, n, m, ms, rng)
    # lane 3: min -x0, only x1 bounded
    fs[3] = 0.0; fs[3, 0] = -1.0
    As[3] = 0.0; As[3, :, 1] = 1.0
    bus[3] = 1.0; bls[3] = -1.0
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 2000}, jnp.float32)
    res = batch_mod.solve_batch_lp_pallas_jit(
        jnp.asarray(fs, jnp.float32), jnp.asarray(As, jnp.float32),
        jnp.asarray(bus, jnp.float32), jnp.asarray(bls, jnp.float32),
        jnp.asarray(sense), st, ms=ms, interpret=True)
    flags = np.asarray(res.exitflag)
    assert flags[3] == -3, flags          # EXIT_UNBOUNDED
    others = np.ones(B, bool); others[3] = False
    rep = batch_mod.backstop_resolve_lp(res, fs, As, bus, bls, sense,
                                        ms=ms)
    flags2 = np.asarray(rep.exitflag)
    assert (flags2[others] == 1).all() and flags2[3] == -3, flags2
    err = np.abs(np.asarray(rep.x)[others] - xs[others]).max()
    assert err < 1e-4, err


def test_batch_lp_full_tile_accounted():
    # VERDICT r4 #5: a full 128-lane tile at a reference-ish size with
    # EVERY lane accounted — optimal lanes must meet the reference
    # gates, non-optimal lanes must be LOUD and each must re-solve
    # through the backstop (no silent or amortized failures)
    B, n, m, ms = 128, 20, 50, 0
    rng = np.random.default_rng(71)
    xs, fs, As, bus, bls = _make_batch(B, n, m, ms, rng)
    sense = np.zeros((B, m), np.int32)
    st = _as_settings({"iter_limit": 3000}, jnp.float32)
    res = batch_mod.solve_batch_lp_pallas_jit(
        jnp.asarray(fs, jnp.float32), jnp.asarray(As, jnp.float32),
        jnp.asarray(bus, jnp.float32), jnp.asarray(bls, jnp.float32),
        jnp.asarray(sense), st, ms=ms, interpret=True)
    flags = np.asarray(res.exitflag)
    x = np.asarray(res.x)
    fv_ref = np.einsum('bn,bn->b', fs, xs)
    fv_got = np.einsum('bn,bn->b', fs, x)
    gap = np.abs(fv_got - fv_ref) / (1.0 + np.abs(fv_ref))
    vals = np.einsum('bmn,bn->bm', As, x)
    feas = np.maximum((vals - bus).max(axis=1), (bls - vals).max(axis=1))
    for b in range(B):
        if flags[b] == 1:
            assert gap[b] < 1e-4, (b, gap[b])
            assert feas[b] < 1e-4, (b, feas[b])
        else:
            # loud lane: must be negative (no silent wrong answers) ...
            assert flags[b] < 0, (b, flags[b])
    # ... and every loud lane re-solves through the backstop
    if (flags != 1).any():
        rep = batch_mod.backstop_resolve_lp(res, fs, As, bus, bls,
                                            sense, ms=ms)
        flags2 = np.asarray(rep.exitflag)
        assert (flags2 == 1).all(), np.unique(flags2)
        x2 = np.asarray(rep.x)
        gap2 = np.abs(np.einsum('bn,bn->b', fs, x2) - fv_ref) \
            / (1.0 + np.abs(fv_ref))
        assert gap2.max() < 1e-4, gap2.max()
