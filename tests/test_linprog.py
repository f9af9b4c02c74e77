"""LP tests via the adaptive proximal path (core_tests.jl:55-105)."""
import numpy as np
import pytest

import daqp_tpu
from tests.gen import generate_test_lp


def test_linprog_random():
    rng = np.random.default_rng(21)
    for _ in range(10):
        x, f, A, bu, bl, sense = generate_test_lp(20, 100, 10, rng)
        res = daqp_tpu.linprog(f, A, bu, bl, sense, ms=10)
        assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL, int(res.exitflag)
        assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4


def test_linprog_unbounded():
    # min -x1 with only upper bound on x2: unbounded
    f = np.array([-1.0, 0.0])
    A = np.array([[0.0, 1.0]])
    bu = np.array([1.0])
    bl = np.array([-1.0])
    res = daqp_tpu.linprog(f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_UNBOUNDED


def test_linprog_cycle_regression():
    # Hand-constructed degenerate LP in the spirit of core_tests.jl:62-95:
    # many constraints through the same vertex.
    n = 4
    f = -np.ones(n)
    rows = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        rows.append(e)
    # redundant duplicates of the same facets
    A = np.vstack(rows + [np.ones(n) / np.sqrt(n)] * 3)
    bu = np.concatenate([np.ones(n), np.full(3, np.sqrt(n))])
    bl = np.full(len(bu), -100.0)
    res = daqp_tpu.linprog(f, A, bu, bl, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.allclose(np.asarray(res.x), np.ones(n), atol=1e-5)


def test_linprog_large_accuracy():
    # Large LPs hit near-dual-degenerate faces where the raw proximal
    # fixed point sits ~1e-2 off the optimal vertex; the cleanup
    # (tighten -> crossover with dual-sign exchange -> vertex solve)
    # must land on the exact vertex (reference gate ||x - xref|| <= 1e-4,
    # benchmark.jl:39).
    rng = np.random.default_rng(2500)
    x, f, A, bu, bl, sense = generate_test_lp(200, 1000, 100, rng)
    res = daqp_tpu.linprog(f, A, bu, bl, sense, ms=100)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x) - x) < 1e-8
