"""Codegen tests: compile the generated embedded C solver with gcc and
re-solve through it (the reference's compile-and-run codegen test,
core_tests.jl:253-291), plus the AOT StableHLO export round-trip."""
import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

import daqp_tpu
from daqp_tpu import codegen
from tests.gen import generate_test_qp


requires_gcc = pytest.mark.skipif(shutil.which("gcc") is None,
                                  reason="gcc not available")


def _build_and_load(cpath):
    sopath = cpath[:-2] + ".so"
    subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", sopath, cpath,
                    "-lm"], check=True)
    return ctypes.CDLL(sopath)


@requires_gcc
def test_codegen_compile_and_solve():
    rng = np.random.default_rng(101)
    x, H, f, A, bu, bl, sense = generate_test_qp(10, 30, 0, 6, 1e2, rng)
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(H, f, A, bu, bl, name="emb", dir=td)
        lib = _build_and_load(cpath)
        lib.emb_init()
        xs = (ctypes.c_double * 10)()
        lam = (ctypes.c_double * 30)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = lib.emb_solve(xs, lam, ctypes.byref(fval),
                             ctypes.byref(iters))
        assert flag == 1, flag
        xs = np.array(xs[:])
        assert np.linalg.norm(xs - x) < 1e-6, np.linalg.norm(xs - x)
        # against the JAX solver's fval
        ref = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
        assert abs(fval.value - float(ref.fval)) < 1e-6
        # dual stationarity through the embedded duals
        lam = np.array(lam[:])
        grad = H @ xs + f + A.T @ lam
        assert np.linalg.norm(grad) < 1e-6


@requires_gcc
def test_codegen_mpc_update_resolve():
    # MPC pattern in C: update f/bounds, warm re-solve (working set kept)
    rng = np.random.default_rng(103)
    x, H, f, A, bu, bl, sense = generate_test_qp(8, 20, 0, 5, 1e2, rng)
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(H, f, A, bu, bl, name="mpc", dir=td)
        lib = _build_and_load(cpath)
        lib.mpc_init()
        xs = (ctypes.c_double * 8)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        assert lib.mpc_solve(xs, None, ctypes.byref(fval),
                             ctypes.byref(iters)) == 1
        it_cold = iters.value
        f2 = f * 1.0001
        arr = lambda a: (ctypes.c_double * len(a))(*a)
        lib.mpc_update(arr(f2), arr(bu), arr(bl))
        assert lib.mpc_solve(xs, None, ctypes.byref(fval),
                             ctypes.byref(iters)) == 1
        assert iters.value <= 3, (it_cold, iters.value)
        ref = daqp_tpu.quadprog(H, f2, A, bu, bl, ms=0)
        assert np.linalg.norm(np.array(xs[:]) - np.asarray(ref.x)) < 1e-6


@requires_gcc
def test_codegen_infeasible():
    H = np.eye(2)
    f = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    bu = np.array([-1.0, 5.0])
    bl = np.array([-5.0, 1.0])
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(H, f, A, bu, bl, name="inf", dir=td)
        lib = _build_and_load(cpath)
        lib.inf_init()
        xs = (ctypes.c_double * 2)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        assert lib.inf_solve(xs, None, ctypes.byref(fval),
                             ctypes.byref(iters)) == -1


def test_aot_export_roundtrip():
    from jax import export as jexport
    import jax.numpy as jnp
    blob = codegen.export_aot(6, 12, dtype="float64")
    rebuilt = jexport.deserialize(blob)
    rng = np.random.default_rng(107)
    x, H, f, A, bu, bl, sense = generate_test_qp(6, 12, 0, 4, 1e2, rng)
    out = rebuilt.call(jnp.asarray(H), jnp.asarray(f), jnp.asarray(A),
                       jnp.asarray(bu), jnp.asarray(bl),
                       jnp.asarray(sense))
    assert int(out["exitflag"]) == daqp_tpu.EXIT_OPTIMAL
    assert np.linalg.norm(np.asarray(out["x"]) - x) < 1e-6
