"""Randomized oracle tests for the convex QP path.

Mirrors the reference testsets 'quadprog' and 'one-sided bounds'
(interfaces/daqp-julia/test/core_tests.jl:25-53): constructed-solution
problems from the generate_test_qp fixture, asserting ||x - xref|| and KKT
stationarity to the reference tolerances.
"""
import numpy as np
import pytest

import daqp_tpu
from tests.gen import generate_test_qp


def _kkt_residual(H, f, A, ms, res):
    lam = np.asarray(res.lam)
    grad = H @ np.asarray(res.x) + f
    if ms > 0:
        grad[:ms] += lam[:ms]
    grad += A.T @ lam[ms:]
    return np.linalg.norm(grad)


@pytest.mark.parametrize("dims", [(10, 50, 5, 8), (50, 250, 25, 40)])
def test_quadprog_random(dims):
    n, m, ms, nact = dims
    rng = np.random.default_rng(1234)
    for _ in range(20):
        x, H, f, A, bu, bl, sense = generate_test_qp(n, m, ms, nact, 1e2, rng)
        res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=ms)
        assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
        assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4
        assert _kkt_residual(H, f, A, ms, res) < 1e-5


def test_quadprog_large():
    # Reference suite size (core_tests.jl:19-24): n=100, m=500, ms=50
    rng = np.random.default_rng(7)
    x, H, f, A, bu, bl, sense = generate_test_qp(100, 500, 50, 80, 1e2, rng)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=50)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4


def test_one_sided_bounds():
    # core_tests.jl:38-46: dropping irrelevant lower bounds leaves x*
    rng = np.random.default_rng(3)
    for _ in range(5):
        x, H, f, A, bu, bl, sense = generate_test_qp(20, 100, 0, 10, 1e2, rng)
        res_two = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
        res_one = daqp_tpu.quadprog(H, f, A, bu, None, sense, ms=0)
        lam = np.asarray(res_two.lam)
        if np.all(lam >= -1e-10):  # only upper bounds active
            assert np.linalg.norm(np.asarray(res_one.x) - x) < 1e-4


def test_unconstrained_shortcut():
    n = 8
    rng = np.random.default_rng(5)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    H = Q @ np.diag(1.0 + rng.random(n)) @ Q.T
    f = rng.standard_normal(n)
    x_unc = -np.linalg.solve(H, f)
    A = rng.standard_normal((4, n))
    bu = A @ x_unc + 1.0
    bl = A @ x_unc - 1.0
    res = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert int(res.iterations) <= 1
    assert np.linalg.norm(np.asarray(res.x) - x_unc) < 1e-8


def test_infeasible():
    # core_tests.jl:359-390 trivially infeasible: bl > bu
    H = np.eye(2)
    f = np.zeros(2)
    A = np.array([[1.0, 1.0]])
    res = daqp_tpu.quadprog(H, f, A, np.array([-1.0]), np.array([1.0]), ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_INFEASIBLE


def test_constraint_infeasible():
    # Geometrically infeasible: x1 >= 1 and x1 <= -1
    H = np.eye(2)
    f = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    bu = np.array([-1.0, 5.0])
    bl = np.array([-5.0, 1.0])
    res = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_INFEASIBLE


def test_equality_constraints():
    rng = np.random.default_rng(11)
    x, H, f, A, bu, bl, sense = generate_test_qp(10, 30, 0, 5, 1e2, rng)
    # Turn two inactive rows into equalities at their current optimal value
    Ax = A @ x
    bu2, bl2 = bu.copy(), bl.copy()
    bu2[:2] = Ax[:2]
    bl2[:2] = Ax[:2]
    res = daqp_tpu.quadprog(H, f, A, bu2, bl2, sense, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.abs(A[:2] @ np.asarray(res.x) - Ax[:2]).max() < 1e-8


def test_bland_pricing():
    # The Bland (lowest-violated-index) option of the reference's
    # executable spec: same optimum as Dantzig, possibly different
    # iteration counts; a traced setting (no recompile on switch).
    rng = np.random.default_rng(117)
    for _ in range(4):
        x, H, f, A, bu, bl, sense = generate_test_qp(10, 30, 0, 6, 1e2,
                                                     rng)
        rd = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0,
                               settings={"pricing":
                                         daqp_tpu.PRICING_DANTZIG})
        rb = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0,
                               settings={"pricing":
                                         daqp_tpu.PRICING_BLAND})
        assert int(rd.exitflag) == int(rb.exitflag) == 1
        assert np.linalg.norm(np.asarray(rd.x) - np.asarray(rb.x)) < 1e-7

    # oracle spec offers the same switch
    from oracle import daqp_numpy
    r_np = daqp_numpy.quadprog(H, f, A, bu, bl, sense, ms=0,
                               settings={"pricing": 1})
    assert r_np['exitflag'] == 1
    assert np.linalg.norm(np.asarray(r_np['x']) - x) < 1e-6

    # batched flat path accepts it too
    import jax.numpy as jnp
    from daqp_tpu import batch as batch_mod
    from daqp_tpu.api import _as_settings
    st = _as_settings({"pricing": daqp_tpu.PRICING_BLAND}, jnp.float64)
    res = batch_mod.solve_batch_flat_jit(
        jnp.asarray(H)[None], jnp.asarray(f)[None], jnp.asarray(A)[None],
        jnp.asarray(bu)[None], jnp.asarray(bl)[None],
        jnp.asarray(sense)[None], st, ms=0)
    assert int(res.exitflag[0]) == 1
    assert np.linalg.norm(np.asarray(res.x[0]) - x) < 1e-6
