"""Slot-space Pallas kernel (ops/pallas_slot.py) — the hard-path batched
tier behind ``solve_batch_pallas_jit(has_soft=False)``.  Interpret mode;
the real-chip gate is scripts/tpu_smoke.py + bench.py."""
import numpy as np

import jax
import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp_batch


def _solve(d, st, **kw):
    args = [jnp.asarray(d[k]) for k in
            ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
    return batch_mod.solve_batch_pallas_jit(*args, st=st, ms=0,
                                            has_soft=False,
                                            interpret=True, **kw)


def test_slot_dense_active_sets():
    # nact close to n: the rank cap k >= n and the pending-singular path
    # get exercised (every extra activation beyond n is singular)
    B, n, m = 128, 8, 40
    d = generate_test_qp_batch(B, n, m, 0, 7, 1e2, rng=21,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 500}, jnp.float32)
    r = _solve(d, st)
    flags = np.asarray(r.exitflag)
    err = np.linalg.norm(np.asarray(r.x) - d['x'], axis=1)
    assert (flags == 1).all(), np.unique(flags)
    assert err.max() < 2e-3, err.max()


def test_slot_warm_start_iterations():
    # sense-ACTIVE warm rows route through slot_activate's (B, K, K)
    # packing Cholesky; a correct warm set must converge in ~1 iteration
    from daqp_tpu.types import ACTIVE, LOWER
    B, n, m = 128, 10, 24
    d = generate_test_qp_batch(B, n, m, 0, 6, 1e2, rng=33,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    cold = _solve(d, st)
    assert (np.asarray(cold.exitflag) == 1).all()
    lam = np.asarray(cold.lam)
    sense = d['sense'].copy()
    sense[lam > 1e-6] |= ACTIVE
    sense[lam < -1e-6] |= ACTIVE | LOWER
    d2 = dict(d)
    d2['sense'] = sense
    warm = _solve(d2, st)
    assert (np.asarray(warm.exitflag) == 1).all()
    err = np.linalg.norm(np.asarray(warm.x) - d['x'], axis=1)
    assert err.max() < 2e-3, err.max()
    assert np.median(np.asarray(warm.iterations)) <= 2, \
        np.median(np.asarray(warm.iterations))


def test_slot_matches_flat_tier():
    # differential: slot kernel vs the flat slot-table tier (same
    # formulation, XLA-composed) on a mixed random batch
    B, n, m = 128, 12, 30
    d = generate_test_qp_batch(B, n, m, 0, 8, 1e3, rng=44,
                               dtype=np.float32)
    st = _as_settings({"iter_limit": 500}, jnp.float32)
    rs = _solve(d, st)
    args = [jnp.asarray(d[k]) for k in
            ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
    rf = batch_mod.solve_batch_flat_jit(*args, st=st, ms=0)
    fs, ff = np.asarray(rs.exitflag), np.asarray(rf.exitflag)
    assert (fs == ff).mean() > 0.98, (np.unique(fs), np.unique(ff))
    both = (fs == 1) & (ff == 1)
    dx = np.linalg.norm(np.asarray(rs.x) - np.asarray(rf.x),
                        axis=1)[both]
    assert dx.max() < 2e-3, dx.max()


def test_slot_bland_pricing():
    # Bland's rule compiled into the kernel (Settings.pricing=1).  In f32
    # Bland's slow degenerate pivots can legitimately trip the
    # progress-based cycle guard on a marginal lane (the flat tier shows
    # the same rate under identical settings — measured 1/128 on this
    # batch, different lanes); optimal lanes must be accurate and the
    # rate must match the flat tier's.
    B, n, m = 128, 10, 24
    d = generate_test_qp_batch(B, n, m, 0, 6, 1e2, rng=71,
                               dtype=np.float32)
    stb = _as_settings({"iter_limit": 500, "pricing": 1}, jnp.float32)
    r = _solve(d, stb)
    flags = np.asarray(r.exitflag)
    err = np.linalg.norm(np.asarray(r.x) - d['x'], axis=1)
    ok = flags == 1
    assert ok.mean() >= 0.97, np.unique(flags, return_counts=True)
    assert err[ok].max() < 2e-3, err[ok].max()
    args = [jnp.asarray(d[k]) for k in
            ('H', 'f', 'A', 'bupper', 'blower', 'sense')]
    rf = batch_mod.solve_batch_flat_jit(*args, st=stb, ms=0)
    assert ok.mean() >= (np.asarray(rf.exitflag) == 1).mean() - 0.02


def test_slot_stress_kkt_gate():
    # harsher conditioning + bigger K, gated on the FULL KKT residual
    # (stationarity, feasibility, complementarity/dual signs — the
    # complementarity term is what catches wrong-working-set exits)
    for (n, m, kappa, seed) in [(24, 60, 1e4, 91), (16, 48, 1e3, 92)]:
        B = 128
        d = generate_test_qp_batch(B, n, m, 0, max(4, n // 2), kappa,
                                   rng=seed, dtype=np.float32)
        st = _as_settings({"iter_limit": 800}, jnp.float32)
        r = _solve(d, st)
        flags = np.asarray(r.exitflag)
        ok = flags == 1
        assert ok.mean() >= 0.97, (n, m, np.unique(flags,
                                                   return_counts=True))
        stat, viol = batch_mod.kkt_residuals(
            d['H'], d['f'], d['A'], d['bupper'], d['blower'], d['sense'],
            np.asarray(r.x), np.asarray(r.lam), ms=0)
        # f32 stationarity degrades with conditioning (~eps * kappa);
        # the complementarity/feasibility part of viol is
        # conditioning-independent and stays at the tight gate
        tol_stat = 1e-5 * np.sqrt(kappa)
        assert stat[ok].max() < tol_stat, (n, m, float(stat[ok].max()))
        assert viol[ok].max() < 1e-4, (n, m, float(viol[ok].max()))


def test_slot_overcapacity_warm_start():
    # more sense-ACTIVE rows than slots: rows beyond capacity must leave
    # the act masks (else they'd be excluded from pricing forever and a
    # violation could go unchecked) — the lane either solves correctly
    # after re-pricing or fails LOUDLY, never a silent wrong answer
    from daqp_tpu.types import ACTIVE
    B, n, m = 128, 4, 16
    d = generate_test_qp_batch(B, n, m, 0, 3, 1e2, rng=83,
                               dtype=np.float32)
    sense = d['sense'].copy()
    sense[:, :10] |= ACTIVE          # 10 > K = n+1 (padded 8)
    d2 = dict(d)
    d2['sense'] = sense
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    r = _solve(d2, st)
    flags = np.asarray(r.exitflag)
    err = np.linalg.norm(np.asarray(r.x) - d['x'], axis=1)
    ok = flags == 1
    assert (err[ok] < 2e-3).all(), float(err[ok].max())
    stat, viol = batch_mod.kkt_residuals(
        d['H'], d['f'], d['A'], d['bupper'], d['blower'], d['sense'],
        np.asarray(r.x), np.asarray(r.lam), ms=0)
    assert (viol[ok] < 1e-4).all(), float(viol[ok].max())
