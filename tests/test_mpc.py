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
