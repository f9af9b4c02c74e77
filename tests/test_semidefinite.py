"""Semidefinite-Hessian QPs via the proximal-point outer loop —
ports of the reference testset 'Semi-proximal regularization'
(core_tests.jl:537-646)."""
import numpy as np

import daqp_tpu


def _ref_solution_box(H, f, lo, hi):
    # brute-force reference on a box via projected gradient (small n)
    x = np.zeros(len(f))
    L = np.linalg.eigvalsh(H).max() + 1.0
    for _ in range(200000):
        x = np.clip(x - (H @ x + f) / L, lo, hi)
    return x


def test_diagonal_singular_semi_proximal():
    # diagonal H with zero entries: semi-proximal (perturb only the
    # singular directions, utils.c:179-207)
    H = np.diag([2.0, 0.0, 1.0, 0.0])
    f = np.array([-1.0, 1.0, -1.0, -2.0])
    n = 4
    A = np.eye(n)
    bu = np.ones(n)
    bl = -np.ones(n)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL, int(res.exitflag)
    xref = _ref_solution_box(H, f, bl, bu)
    assert np.linalg.norm(np.asarray(res.x) - xref) < 1e-4, \
        (res.x, xref)


def test_dense_singular_full_shift():
    # dense rank-deficient H: full proximal shift with retry-doubling
    # (utils.c:253-283)
    rng = np.random.default_rng(311)
    V = rng.standard_normal((4, 2))
    H = V @ V.T                      # rank 2, dense
    f = rng.standard_normal(4)
    A = np.eye(4)
    bu = np.ones(4)
    bl = -np.ones(4)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL, int(res.exitflag)
    xref = _ref_solution_box(H, f, bl, bu)
    assert 0.5 * res.x @ (H @ np.asarray(res.x)) + f @ np.asarray(res.x) \
        <= 0.5 * xref @ (H @ xref) + f @ xref + 1e-5


def test_semidefinite_objective_value():
    # fixed-point iteration must reach the true optimum of a
    # semidefinite problem with an interior + boundary mix
    H = np.diag([1.0, 0.0])
    f = np.array([-0.5, -1.0])       # x2 unbounded below in H -> bound
    A = np.eye(2)
    bu = np.array([2.0, 3.0])
    bl = np.array([-2.0, -3.0])
    res = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.allclose(np.asarray(res.x), [0.5, 3.0], atol=1e-5), res.x
