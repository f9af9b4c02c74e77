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
