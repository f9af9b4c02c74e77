"""Soft-constraint tests (sense SOFT, rho_soft penalty; reference soft
paths in factorization.c:14-16, auxiliary.c:46-87, daqp.c:59-62)."""
import numpy as np

import daqp_tpu


def test_soft_constraint_conflict():
    # Hard x <= 0 vs soft x >= 1: soft is violated, status SOFT_OPTIMAL
    H = np.eye(1)
    f = np.zeros(1)
    A = np.array([[1.0], [1.0]])
    bu = np.array([0.0, 1e30])
    bl = np.array([-1e30, 1.0])
    sense = np.array([0, daqp_tpu.SOFT], np.int32)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_SOFT_OPTIMAL, int(res.exitflag)
    # Large penalty pushes x toward the hard bound
    assert float(res.x[0]) <= 1e-6
    assert float(res.soft_slack) > 0


def test_soft_constraint_inactive_when_feasible():
    # A feasible soft constraint behaves like a hard one
    rng = np.random.default_rng(89)
    from tests.gen import generate_test_qp
    x, H, f, A, bu, bl, sense = generate_test_qp(10, 30, 0, 6, 1e2, rng)
    sense_soft = sense.copy()
    sense_soft[:] = daqp_tpu.SOFT
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense_soft, ms=0)
    assert int(res.exitflag) in (daqp_tpu.EXIT_OPTIMAL,
                                 daqp_tpu.EXIT_SOFT_OPTIMAL)
    # rho_soft = 1e-6 perturbs the active-set optimum only slightly
    assert np.linalg.norm(np.asarray(res.x) - x) < 1e-2


def test_soft_equality_least_squares():
    # Conflicting soft equalities settle at the least-squares compromise
    H = np.eye(1)
    f = np.zeros(1)
    A = np.array([[1.0], [1.0]])
    b1, b2 = 4.0, 8.0
    bu = np.array([b1, b2])
    bl = np.array([b1, b2])
    sense = np.array([daqp_tpu.SOFT, daqp_tpu.SOFT], np.int32)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_SOFT_OPTIMAL
    # with tiny rho_soft and H = I: x ~ (b1+b2)/2 (up to the x'x term)
    assert abs(float(res.x[0]) - 6.0) < 0.01, res.x
