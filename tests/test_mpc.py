"""MPC scan tests: the whole warm-started horizon inside one lax.scan
(the in-jit form of the reference's repeated-solve contract,
SURVEY.md §3.5)."""
import numpy as np

import jax.numpy as jnp

import daqp_tpu
from daqp_tpu import mpc
from daqp_tpu.api import _as_settings
from tests.gen import generate_test_qp


def test_mpc_scan_warm_iterations():
    rng = np.random.default_rng(307)
    x, H, f, A, bu, bl, sense = generate_test_qp(12, 40, 0, 8, 1e2, rng)
    T = 20
    # slowly drifting horizon
    drift = 0.002 * np.arange(T)[:, None]
    f_seq = f[None, :] * (1.0 + drift[:, :1])
    bu_seq = np.repeat(bu[None, :], T, axis=0) + drift
    bl_seq = np.repeat(bl[None, :], T, axis=0) - drift
    st = _as_settings(None, jnp.float64)
    out = mpc.solve_mpc_scan(jnp.asarray(H), jnp.asarray(A),
                             jnp.asarray(f_seq), jnp.asarray(bu_seq),
                             jnp.asarray(bl_seq), st, ms=0)
    flags = np.asarray(out.exitflag)
    assert np.all(flags == daqp_tpu.EXIT_OPTIMAL), flags
    iters = np.asarray(out.iterations)
    # warm steps after the first should be cheap (0-2 active-set changes)
    assert np.median(iters[1:]) <= 3, iters
    # every step matches an independent cold solve
    for t in (0, T // 2, T - 1):
        ref = daqp_tpu.quadprog(H, f_seq[t], A, bu_seq[t], bl_seq[t], ms=0)
        assert np.allclose(np.asarray(out.x)[t], np.asarray(ref.x),
                           atol=1e-7), t


def test_mpc_scan_pallas_batched():
    # The scenario-batched Pallas-tier MPC scan: warm kernel state carried
    # across the horizon, per-(scenario, step) results vs fresh solves
    import jax.numpy as jnp
    from daqp_tpu import mpc as mpc_mod
    from daqp_tpu.api import _as_settings

    S, T, n, m = 128, 5, 10, 24
    rng = np.random.default_rng(55)
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m, 0, 6, 1e2, rng)
    H, f, A, bu, bl = (v.astype(np.float32) for v in (H, f, A, bu, bl))
    drift_f = 0.03 * rng.standard_normal((S, T, n)).astype(np.float32)
    drift_b = 0.03 * rng.standard_normal((S, T, m)).astype(np.float32)
    f_seq = np.cumsum(drift_f, axis=1) + f
    bu_seq = np.cumsum(np.abs(drift_b), axis=1) + bu
    bl_seq = bl - np.cumsum(np.abs(drift_b), axis=1)
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    out = mpc_mod.solve_mpc_scan_pallas(
        jnp.asarray(H), jnp.asarray(A), jnp.asarray(f_seq),
        jnp.asarray(bu_seq), jnp.asarray(bl_seq), st, ms=0,
        interpret=True)
    flags = np.asarray(out.exitflag)
    assert np.all(flags == 1), np.unique(flags, return_counts=True)
    iters = np.asarray(out.iterations)
    assert iters[:, 1:].mean() < 15, iters[:, 1:].mean()  # warm steps
    xs = np.asarray(out.x)
    for s in range(0, S, 37):
        for t in range(T):
            ref = daqp_tpu.quadprog(
                H.astype(np.float64), f_seq[s, t].astype(np.float64),
                A.astype(np.float64), bu_seq[s, t].astype(np.float64),
                bl_seq[s, t].astype(np.float64), ms=0)
            assert int(ref.exitflag) == 1
            err = np.linalg.norm(xs[s, t] - np.asarray(ref.x))
            assert err < 2e-3, (s, t, err)


def test_mpc_scan_pallas_fused_matches():
    # The in-kernel horizon variant (run_mpc_segment, VERDICT r4 #3):
    # per-(scenario, step) results must match the per-step Pallas scan
    # and fresh solves; seg=2 over T=5 also exercises the repeat-pad
    # tail (Tp=6)
    import jax.numpy as jnp
    from daqp_tpu import mpc as mpc_mod
    from daqp_tpu.api import _as_settings

    S, T, n, m = 128, 5, 10, 24
    rng = np.random.default_rng(55)
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m, 0, 6, 1e2, rng)
    H, f, A, bu, bl = (v.astype(np.float32) for v in (H, f, A, bu, bl))
    drift_f = 0.03 * rng.standard_normal((S, T, n)).astype(np.float32)
    drift_b = 0.03 * rng.standard_normal((S, T, m)).astype(np.float32)
    f_seq = np.cumsum(drift_f, axis=1) + f
    bu_seq = np.cumsum(np.abs(drift_b), axis=1) + bu
    bl_seq = bl - np.cumsum(np.abs(drift_b), axis=1)
    st = _as_settings({"iter_limit": 400}, jnp.float32)
    out = mpc_mod.solve_mpc_scan_pallas_fused(
        jnp.asarray(H), jnp.asarray(A), jnp.asarray(f_seq),
        jnp.asarray(bu_seq), jnp.asarray(bl_seq), st, ms=0,
        seg=2, interpret=True)
    flags = np.asarray(out.exitflag)
    assert np.all(flags == 1), np.unique(flags, return_counts=True)
    iters = np.asarray(out.iterations)
    assert iters[:, 1:].mean() < 15, iters[:, 1:].mean()  # warm steps
    xs = np.asarray(out.x)
    for s in range(0, S, 37):
        for t in range(T):
            ref = daqp_tpu.quadprog(
                H.astype(np.float64), f_seq[s, t].astype(np.float64),
                A.astype(np.float64), bu_seq[s, t].astype(np.float64),
                bl_seq[s, t].astype(np.float64), ms=0)
            assert int(ref.exitflag) == 1
            err = np.linalg.norm(xs[s, t] - np.asarray(ref.x))
            assert err < 2e-3, (s, t, err)
