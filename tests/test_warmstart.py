"""Warm-start tests — ports of the reference testset 'Setting Warm Start'
(interfaces/daqp-julia/test/core_tests.jl:449-496)."""
import numpy as np

import daqp_tpu
from tests.gen import generate_test_qp, generate_test_lp, generate_test_avi


def test_primal_warm_start_one_iteration():
    rng = np.random.default_rng(41)
    x, H, f, A, bu, bl, sense = generate_test_qp(50, 250, 25, 40, 1e2, rng)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=25, primal_start=x)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4
    assert int(res.iterations) == 1, int(res.iterations)


def test_dual_warm_start_one_iteration():
    rng = np.random.default_rng(43)
    x, H, f, A, bu, bl, sense = generate_test_qp(50, 250, 25, 40, 1e2, rng)
    cold = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=25)
    lam = np.asarray(cold.lam)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=25, dual_start=lam)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4
    assert int(res.iterations) == 1, int(res.iterations)


def test_degenerate_primal_start():
    # core_tests.jl:475-481: recover from a degenerate starting point
    H = np.eye(2)
    f = np.zeros(2)
    A = np.ones((1, 2))
    bu = np.array([1.0, 1.0, 2.0])
    res = daqp_tpu.quadprog(H, f, A, bu, None, ms=2,
                            primal_start=np.array([1.0, 1.0]))
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x)) < 1e-5


def test_lp_warm_start_fewer_iterations():
    # core_tests.jl:484-488
    rng = np.random.default_rng(47)
    x, f, A, bu, bl, sense = generate_test_lp(20, 100, 10, rng)
    cold = daqp_tpu.linprog(f, A, bu, bl, sense, ms=10)
    warm = daqp_tpu.linprog(f, A, bu, bl, sense, ms=10,
                            primal_start=0.95 * x)
    assert int(warm.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(warm.x) - x) < 1e-4
    assert int(warm.iterations) < int(cold.iterations), \
        (int(warm.iterations), int(cold.iterations))


def test_avi_warm_start():
    # core_tests.jl:490-494
    rng = np.random.default_rng(53)
    x, H, f, A, b = generate_test_avi(30, 100, rng)
    warm = daqp_tpu.avi(H, f, A, b, ms=0, primal_start=0.95 * x)
    assert int(warm.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(warm.x) - x) < 1e-4
