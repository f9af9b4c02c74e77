"""SOFT_WEIGHTS on the dense-mask Pallas kernel (interpret mode on CPU).

Differential ground truths, in order of authority:
  * the LIFTED plain slack QP in f64 (tests/test_soft_weights.py helper)
  * the flat SW tier (``solve_batch_flat_jit(sw=)``) on the same f32 data
  * the plain-soft dense kernel (sw with d=0 / rho=rho_soft must agree)

Reference semantics: auxiliary.c:199-274 (slack-dual blocking),
factorization.c:31-40 (per-side rho on the Gram diagonal of FREE slacks),
auxiliary.c:30-36 (FIXED/FREE threshold).
"""
import numpy as np
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from daqp_tpu.types import SOFT, SoftWeights
from tests.test_soft_weights import _lift_and_solve


def _make_batch(B, n, m, soft_rows, seed, d_scale=0.4, rho_lo=0.5):
    rng = np.random.default_rng(seed)
    Hs = np.empty((B, n, n), np.float32)
    fs = np.empty((B, n), np.float32)
    As = np.empty((B, m, n), np.float32)
    bus = np.empty((B, m), np.float32)
    bls = np.empty((B, m), np.float32)
    d_ls = np.zeros((B, m), np.float32)
    d_us = np.zeros((B, m), np.float32)
    rho_ls = np.ones((B, m), np.float32)
    rho_us = np.ones((B, m), np.float32)
    for b in range(B):
        Q = rng.standard_normal((n, n))
        Hs[b] = Q @ Q.T + 0.5 * np.eye(n)
        fs[b] = 3 * rng.standard_normal(n)
        As[b] = rng.standard_normal((m, n))
        bus[b] = 0.3 * rng.random(m)
        bls[b] = bus[b] - 0.3 - 0.5 * rng.random(m)
        d_ls[b, soft_rows] = d_scale * rng.random(len(soft_rows))
        d_us[b, soft_rows] = d_scale * rng.random(len(soft_rows))
        rho_ls[b, soft_rows] = rho_lo + rng.random(len(soft_rows))
        rho_us[b, soft_rows] = rho_lo + rng.random(len(soft_rows))
    sense = np.zeros((B, m), np.int32)
    sense[:, soft_rows] = SOFT
    sw = SoftWeights(d_ls=jnp.asarray(d_ls), d_us=jnp.asarray(d_us),
                     rho_ls=jnp.asarray(rho_ls), rho_us=jnp.asarray(rho_us))
    return (Hs, fs, As, bus, bls, sense, sw,
            dict(d_ls=d_ls, d_us=d_us, rho_ls=rho_ls, rho_us=rho_us))


def _solve_kernel(Hs, fs, As, bus, bls, sense, sw, st):
    return batch_mod.solve_batch_pallas_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
        ms=0, interpret=True, sw=sw)


def test_pallas_sw_matches_lifted_and_flat():
    # One full 128-lane tile; small slack bounds so both FREE and FIXED
    # regimes (and their transitions) occur across the batch.
    B, n, m = 128, 6, 14
    soft_rows = [0, 3, 7, 11]
    Hs, fs, As, bus, bls, sense, sw, raw = _make_batch(
        B, n, m, soft_rows, seed=57)
    st = _as_settings({"iter_limit": 500}, jnp.float32)
    res = _solve_kernel(Hs, fs, As, bus, bls, sense, sw, st)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    assert np.all(flags > 0), np.unique(flags, return_counts=True)

    # f64 lifted ground truth on a sample of lanes
    for b in range(0, B, 9):
        x_ref = _lift_and_solve(
            np.float64(Hs[b]), np.float64(fs[b]), np.float64(As[b]),
            np.float64(bus[b]), np.float64(bls[b]), soft_rows,
            np.float64(raw['d_ls'][b]), np.float64(raw['d_us'][b]),
            np.float64(raw['rho_ls'][b]), np.float64(raw['rho_us'][b]))
        err = np.abs(xs[b] - x_ref).max()
        assert err < 5e-4, (b, err)

    # flat SW tier differential on the whole batch (same f32 data)
    res_f = batch_mod.solve_batch_flat_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
        ms=0, K=n + len(soft_rows) + 1, sw=sw)
    flags_f = np.asarray(res_f.exitflag)
    ok = (flags > 0) & (flags_f > 0)
    assert ok.mean() == 1.0, (np.unique(flags), np.unique(flags_f))
    dx = np.abs(xs - np.asarray(res_f.x)).max(axis=1)
    assert dx[ok].max() < 2e-4, dx[ok].max()


def test_pallas_sw_lane_padding_and_fixed_regime():
    # Non-multiple-of-128 batch (exercises the trivial-lane padding with
    # zero SW data) with AGGRESSIVE slack bounds: large rho + small d
    # pins most slacks FIXED, so transitions and re-adds dominate.
    B, n, m = 24, 5, 12
    soft_rows = [0, 2, 5, 8, 10]
    Hs, fs, As, bus, bls, sense, sw, raw = _make_batch(
        B, n, m, soft_rows, seed=91, d_scale=1.5, rho_lo=2.0)
    st = _as_settings({"iter_limit": 500}, jnp.float32)
    res = _solve_kernel(Hs, fs, As, bus, bls, sense, sw, st)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    assert np.all(flags > 0), np.unique(flags, return_counts=True)
    for b in range(B):
        x_ref = _lift_and_solve(
            np.float64(Hs[b]), np.float64(fs[b]), np.float64(As[b]),
            np.float64(bus[b]), np.float64(bls[b]), soft_rows,
            np.float64(raw['d_ls'][b]), np.float64(raw['d_us'][b]),
            np.float64(raw['rho_ls'][b]), np.float64(raw['rho_us'][b]))
        err = np.abs(xs[b] - x_ref).max()
        assert err < 5e-4, (b, err)


def test_pallas_sw_defaults_match_plain_soft_kernel():
    # d = 0 with rho = rho_soft per side must reproduce the plain-soft
    # dense-kernel results exactly (the SW state machine degenerates to
    # the plain soft path: every slack is FREE at its first add).
    # Rows are pre-normalized to unit norm IN U-SPACE (rows of A R^{-1}):
    # plain rho_soft applies to the NORMALIZED LDP rows while SW rho is
    # scaling^2-compensated to raw units (utils.c:99-110) — they only
    # coincide at scaling == 1 (same setup as
    # test_soft_weights_defaults_match_plain_soft).
    B, n, m = 128, 6, 14
    soft_rows = [0, 3, 7, 11]
    Hs, fs, As, bus, bls, sense, _, _ = _make_batch(
        B, n, m, soft_rows, seed=3)
    for b in range(B):
        R = np.linalg.cholesky(np.float64(Hs[b])).T
        nrm = np.linalg.norm(np.float64(As[b]) @ np.linalg.inv(R), axis=1)
        As[b] = As[b] / nrm[:, None]
        bus[b] = bus[b] / nrm
        bls[b] = bls[b] / nrm
    # rho = 1.0, not the 1e-4 f32 default: duals scale like 1/rho, and a
    # tiny uniform rho makes the f32 comparison conditioning-bound
    rho = 1.0
    st = _as_settings({"iter_limit": 500, "rho_soft": rho}, jnp.float32)
    zm = jnp.zeros((B, m), jnp.float32)
    rm = jnp.full((B, m), rho, jnp.float32)
    sw = SoftWeights(d_ls=zm, d_us=zm, rho_ls=rm, rho_us=rm)
    res_sw = _solve_kernel(Hs, fs, As, bus, bls, sense, sw, st)
    res_pl = batch_mod.solve_batch_pallas_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
        ms=0, interpret=True, has_soft=True)
    f_sw = np.asarray(res_sw.exitflag)
    f_pl = np.asarray(res_pl.exitflag)
    assert np.all(f_sw > 0) and np.all(f_pl > 0), (
        np.unique(f_sw), np.unique(f_pl))
    dx = np.abs(np.asarray(res_sw.x) - np.asarray(res_pl.x)).max()
    assert dx < 1e-5, dx
    ds = np.abs(np.asarray(res_sw.soft_slack)
                - np.asarray(res_pl.soft_slack)).max()
    assert ds < 1e-5, ds


def test_pallas_sw_stream_tier_pad_branch():
    # streaming variant with B % chunk != 0: exercises the trivial-lane
    # SW padding and the lax.map sw threading; must match the per-call
    # kernel tier exactly (identical per-lane programs)
    B, n, m = 24, 5, 12
    soft_rows = [0, 2, 5, 8, 10]
    Hs, fs, As, bus, bls, sense, sw, _ = _make_batch(
        B, n, m, soft_rows, seed=91, d_scale=1.5, rho_lo=2.0)
    st = _as_settings({"iter_limit": 500}, jnp.float32)
    res = _solve_kernel(Hs, fs, As, bus, bls, sense, sw, st)
    res_s = batch_mod.solve_batch_pallas_stream_jit(
        jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
        jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
        ms=0, chunk=16, sw=sw, interpret=True)
    assert np.array_equal(np.asarray(res.exitflag),
                          np.asarray(res_s.exitflag))
    dx = np.abs(np.asarray(res.x) - np.asarray(res_s.x)).max()
    assert dx < 1e-6, dx


def test_pallas_sw_equality_activation():
    # SW batch with an equality row (bulk activation path): the activated
    # row's Gram and the SW rows' slack states must coexist.
    B, n, m = 24, 5, 12
    soft_rows = [2, 6, 9]
    Hs, fs, As, bus, bls, sense, sw, raw = _make_batch(
        B, n, m, soft_rows, seed=11)
    sense = sense.copy()
    bls[:, 0] = bus[:, 0]                        # row 0: equality
    sense[:, 0] = 1 | 4                          # ACTIVE | IMMUTABLE
    st = _as_settings({"iter_limit": 500}, jnp.float32)
    res = _solve_kernel(Hs, fs, As, bus, bls, sense, sw, st)
    flags = np.asarray(res.exitflag)
    xs = np.asarray(res.x)
    assert np.all(flags > 0), np.unique(flags, return_counts=True)
    # equality satisfied
    eq_res = np.abs(np.einsum('bn,bn->b', As[:, 0, :], xs) - bus[:, 0])
    assert eq_res.max() < 5e-4, eq_res.max()
    # lifted ground truth (append the equality as a hard row pair)
    for b in range(0, B, 7):
        x_ref = _lift_and_solve(
            np.float64(Hs[b]), np.float64(fs[b]), np.float64(As[b]),
            np.float64(bus[b]), np.float64(bls[b]), soft_rows,
            np.float64(raw['d_ls'][b]), np.float64(raw['d_us'][b]),
            np.float64(raw['rho_ls'][b]), np.float64(raw['rho_us'][b]))
        err = np.abs(xs[b] - x_ref).max()
        assert err < 5e-4, (b, err)
