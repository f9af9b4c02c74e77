"""MIQP branch-and-bound tests — ports of the reference testset 'BnB'
(interfaces/daqp-julia/test/core_tests.jl:130-178)."""
import numpy as np
import pytest

import daqp_tpu


def _random_miqp(n, m, ms, nb, rng):
    M = rng.standard_normal((n, n))
    H = M.T @ M
    A = rng.standard_normal((m - ms, n))
    bupper = 20 * rng.random(m)
    blower = -20 * rng.random(m)
    f = 100 * rng.standard_normal(n)
    f[:nb] = -np.abs(f[:nb])      # lucrative to leave the origin
    bupper[:nb] = 1.0
    blower[:nb] = 0.0
    sense = np.zeros(m, np.int32)
    sense[:nb] = daqp_tpu.BINARY
    return H, f, A, bupper, blower, sense


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bnb_random_miqp(seed):
    n, m, ms, nb = 20, 60, 10, 6
    rng = np.random.default_rng(seed)
    H, f, A, bu, bl, sense = _random_miqp(n, m, ms, nb, rng)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=ms)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL, int(res.exitflag)
    xb = np.asarray(res.x)[:nb]
    assert np.all((np.abs(xb - 1.0) < 1e-5) | (np.abs(xb) < 1e-5)), xb


def test_bnb_known_solution():
    # core_tests.jl:150-157
    H = np.array([[1, 0.5, 0], [0.5, 1, 0.5], [0, 0.5, 1]])
    f = np.array([1.0, 0, 0])
    A = np.array([[1.0, 2, 3], [1, 1, 0]])
    bu = np.array([1.0, 1, 1, 1e30, 1e30])
    bl = np.array([0.0, 0, 0, 4, 1])
    sense = np.array([daqp_tpu.BINARY] * 3 + [0, 0], np.int32)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=3)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x) - [0, 1, 1]) < 1e-5, res.x


def test_bnb_zero_dual_endpoint_no_branch():
    # core_tests.jl:159-171: binaries integer-feasible at a zero-dual
    # endpoint must not be branched on -> a single node
    n = 8
    H = np.eye(n)
    f = np.zeros(n)
    bu = np.ones(n)
    bl = np.zeros(n)
    sense = np.full(n, daqp_tpu.BINARY, np.int32)
    res = daqp_tpu.quadprog(H, f, np.zeros((0, n)), bu, bl, sense, ms=n)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.abs(np.asarray(res.x)).max() < 1e-5
    assert int(res.nodes) == 1, int(res.nodes)

    # Same but as general binary rows (core_tests.jl:173-178)
    res = daqp_tpu.quadprog(H, f, H, bu, bl, sense, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.abs(np.asarray(res.x)).max() < 1e-5
    assert int(res.nodes) == 1


def test_bnb_infeasible():
    # Binary feasibility conflicts with a hard constraint
    H = np.eye(2)
    f = np.zeros(2)
    A = np.array([[1.0, 1.0]])
    bu = np.array([1.0, 1.0, 0.5])
    bl = np.array([0.0, 0.0, 0.5])
    sense = np.array([daqp_tpu.BINARY, daqp_tpu.BINARY, 0], np.int32)
    res = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=2)
    assert int(res.exitflag) == daqp_tpu.EXIT_INFEASIBLE
