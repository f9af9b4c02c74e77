"""Differential tests: pure-NumPy oracle solver vs the JAX solver on
identical problems (the role of the reference's pure-Julia solver
``daqp_julia.jl`` tested against the C core, core_tests.jl:107-128)."""
import numpy as np

import daqp_tpu
from oracle import daqp_numpy
from tests.gen import generate_test_qp


def test_oracle_vs_jax_random():
    rng = np.random.default_rng(211)
    for _ in range(10):
        x, H, f, A, bu, bl, sense = generate_test_qp(15, 50, 5, 10, 1e2,
                                                     rng)
        r_np = daqp_numpy.quadprog(H, f, A, bu, bl, sense, ms=5)
        r_jx = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=5)
        assert r_np['exitflag'] == 1
        assert int(r_jx.exitflag) == 1
        assert np.linalg.norm(np.asarray(r_np['x']) - np.asarray(r_jx.x)) \
            < 1e-8
        assert abs(float(r_np['fval']) - float(r_jx.fval)) < 1e-8


def test_oracle_vs_jax_infeasible():
    H = np.eye(2)
    f = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    bu = np.array([-1.0, 5.0])
    bl = np.array([-5.0, 1.0])
    r_np = daqp_numpy.quadprog(H, f, A, bu, bl, ms=0)
    r_jx = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    assert r_np['exitflag'] == int(r_jx.exitflag) == -1


def test_lp_oracle_vs_jax():
    # LP differential: loop-based proximal-point oracle vs linprog
    # (role of the reference's LP path through daqp_prox.c, exercised by
    # benchmark.jl:92-154)
    from oracle import prox_numpy
    rng = np.random.default_rng(47)
    for _ in range(6):
        n, m = 12, 40
        A = rng.standard_normal((m, n))
        bu = 2 + 2 * rng.random(m)
        bl = -(2 + 2 * rng.random(m))
        f = rng.standard_normal(n)
        r_np = prox_numpy.linprog(f, A, bu, bl)
        r_jx = daqp_tpu.linprog(f, A, bu, bl)
        assert r_np['exitflag'] == 1, r_np['exitflag']
        assert int(r_jx.exitflag) == 1
        assert abs(float(r_np['fval']) - float(r_jx.fval)) \
            < 1e-6 * (1 + abs(r_np['fval'])), \
            (r_np['fval'], float(r_jx.fval))
        # both report valid LP duals: f + A' lam = 0
        for lam in (r_np['lam'], np.asarray(r_jx.lam)):
            assert np.linalg.norm(f + A.T @ lam) < 1e-5


def test_lp_oracle_unbounded():
    from oracle import prox_numpy
    f = np.array([-1.0, 0.0])
    A = np.array([[0.0, 1.0]])
    bu = np.array([1.0])
    bl = np.array([-1.0])
    r_np = prox_numpy.linprog(f, A, bu, bl)
    r_jx = daqp_tpu.linprog(f, A, bu, bl)
    assert r_np['exitflag'] == -3, r_np['exitflag']
    assert int(r_jx.exitflag) == -3


def test_bnb_oracle_vs_jax():
    # MIQP differential: DFS/dominance-cut oracle (bnb.c semantics) vs the
    # JAX branch-and-bound on random instances with general binary rows
    from oracle import bnb_numpy
    rng = np.random.default_rng(31)
    for seed in range(6):
        n, m, nb = 6, 14, 4
        Mx = rng.standard_normal((n, n))
        H = Mx.T @ Mx + 0.1 * np.eye(n)
        f = 10 * rng.standard_normal(n)
        A = rng.standard_normal((m, n))
        bu = 15 * rng.random(m)
        bl = -15 * rng.random(m)
        A[:nb] = 0.0
        A[np.arange(nb), np.arange(nb)] = 1.0
        bu[:nb] = 1.0
        bl[:nb] = 0.0
        sense = np.zeros(m, np.int32)
        sense[:nb] = daqp_tpu.BINARY
        r_np = bnb_numpy.solve_miqp(H, f, A, bu, bl, sense, ms=0)
        r_jx = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
        assert r_np['exitflag'] == int(r_jx.exitflag), \
            (seed, r_np['exitflag'], int(r_jx.exitflag))
        if r_np['exitflag'] == 1:
            assert abs(float(r_np['fval']) - float(r_jx.fval)) < 1e-6, \
                (seed, r_np['fval'], float(r_jx.fval))


def test_bnb_oracle_infeasible():
    from oracle import bnb_numpy
    # binaries whose fixings all violate a hard row
    H = np.eye(2)
    f = np.zeros(2)
    A = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    bu = np.array([1.0, 1.0, 0.4])
    bl = np.array([0.0, 0.0, 0.3])
    sense = np.array([16, 16, 0], np.int32)
    r_np = bnb_numpy.solve_miqp(H, f, A, bu, bl, sense)
    r_jx = daqp_tpu.quadprog(H, f, A, bu, bl, sense)
    assert r_np['exitflag'] == int(r_jx.exitflag) == -1


def test_avi_oracle_vs_jax():
    # AVI differential: loop-based DR oracle (avi_julia.jl role) vs the
    # JAX AVI core on asymmetric-H instances; both verified against the
    # AVI KKT conditions directly
    from oracle import avi_numpy
    rng = np.random.default_rng(77)
    for _ in range(4):
        n, m = 20, 60
        Q = rng.standard_normal((n, n))
        H = Q @ Q.T + 0.5 * np.eye(n) + 0.4 * (Q - Q.T)
        f = rng.standard_normal(n)
        A = rng.standard_normal((m, n))
        bu = 1 + rng.random(m)
        bl = -(1 + rng.random(m))
        r_np = avi_numpy.solve_avi(H, f, A, bu, bl)
        r_jx = daqp_tpu.avi(H, f, A, bu, bl)
        assert r_np['exitflag'] == 1, r_np['exitflag']
        assert int(r_jx.exitflag) == 1
        for x, lam in ((r_np['x'], r_np['lam']),
                       (np.asarray(r_jx.x), np.asarray(r_jx.lam))):
            # AVI KKT: H x + f + A' lam = 0, primal feasible,
            # complementary sign-consistent duals
            assert np.linalg.norm(H @ x + f + A.T @ lam) < 1e-5
            v = A @ x
            assert np.all(v <= bu + 1e-5) and np.all(v >= bl - 1e-5)
        assert np.linalg.norm(np.asarray(r_np['x'])
                              - np.asarray(r_jx.x)) < 1e-4


def test_hierarchical_oracle_vs_jax():
    # Hierarchical differential: loop-based level-walk oracle
    # (hierarchical.c semantics on the NumPy workspace) vs the JAX solver
    # on the reference test shapes + random lexicographic LS instances
    from oracle import hiqp_numpy

    # conflicting equalities (core_tests.jl:348-356)
    A = np.array([[1.0, 0], [1, 0], [0, 1]])
    b = np.array([4.0, 8.0, 1.0])
    r_np = hiqp_numpy.hiqp(None, None, A, b, b, ms=0,
                           break_points=(0, 2, 3))
    r_jx = daqp_tpu.solve(H=None, f=None, A=A, bupper=b, blower=b, ms=0,
                          break_points=(0, 2, 3))
    assert r_np['exitflag'] == 1 and int(r_jx.exitflag) == 1
    assert np.linalg.norm(r_np['x'] - np.asarray(r_jx.x)) < 1e-4
    assert np.linalg.norm(r_np['lam'] - np.asarray(r_jx.lam)) < 1e-3

    # random 3-level lexicographic least squares
    rng = np.random.default_rng(131)
    for _ in range(5):
        n, m = 6, 9
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        bp = (0, 3, 6, 9)
        r_np = hiqp_numpy.hiqp(None, None, A, b.copy(), b.copy(), ms=0,
                               break_points=bp)
        r_jx = daqp_tpu.solve(H=None, f=None, A=A, bupper=b, blower=b,
                              ms=0, break_points=bp)
        assert r_np['exitflag'] > 0 and int(r_jx.exitflag) > 0
        assert np.linalg.norm(r_np['x'] - np.asarray(r_jx.x)) \
            < 1e-4 * (1 + np.linalg.norm(r_np['x'])), \
            (r_np['x'], np.asarray(r_jx.x))
