"""AVI tests — ports of the reference testset 'Affine variational
inequality' (interfaces/daqp-julia/test/core_tests.jl:392-425), using the
constructed-solution generator (test/utils.jl:91-115)."""
import numpy as np

import daqp_tpu
from tests.gen import generate_test_avi


def test_avi_small():
    rng = np.random.default_rng(17)
    for _ in range(5):
        x, H, f, A, b = generate_test_avi(10, 50, rng)
        res = daqp_tpu.avi(H, f, A, b, ms=0)
        assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL, int(res.exitflag)
        assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4, \
            np.linalg.norm(np.asarray(res.x) - x)


def test_avi_reference_size():
    # core_tests.jl:394: n=100, m=500
    rng = np.random.default_rng(23)
    x, H, f, A, b = generate_test_avi(100, 500, rng)
    res = daqp_tpu.avi(H, f, A, b, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL, int(res.exitflag)
    assert np.linalg.norm(np.asarray(res.x) - x) < 1e-4


def test_avi_unconstrained():
    # Unconstrained optimum of the AVI: x = -H^{-1} f strictly inside P
    rng = np.random.default_rng(31)
    Mm = rng.random((6, 6))
    H = Mm.T @ Mm + np.eye(6) + 0.1 * (rng.random((6, 6))
                                       - rng.random((6, 6)))
    f = rng.standard_normal(6)
    x_unc = np.linalg.solve(H, -f)
    A = rng.standard_normal((4, 6))
    b = A @ x_unc + 1.0
    res = daqp_tpu.avi(H, f, A, b, ms=0)
    assert int(res.exitflag) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(res.x) - x_unc) < 1e-8
