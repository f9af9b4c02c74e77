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


@requires_gcc
def test_codegen_soft_constraints():
    # A binding soft row: embedded solve must match the JAX solver and
    # report SOFT_OPTIMAL (daqp.c:59-62)
    H = np.eye(2)
    f = np.array([-2.0, -2.0])
    A = np.array([[1.0, 1.0], [1.0, -1.0]])
    bu = np.array([1.0, 5.0])
    bl = np.array([-5.0, -5.0])
    sense = np.array([daqp_tpu.SOFT, 0], np.int32)
    ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
    assert int(ref.exitflag) == daqp_tpu.EXIT_SOFT_OPTIMAL
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(H, f, A, bu, bl, sense=sense, name="sft",
                                 dir=td)
        lib = _build_and_load(cpath)
        lib.sft_init()
        xs = (ctypes.c_double * 2)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = lib.sft_solve(xs, None, ctypes.byref(fval),
                             ctypes.byref(iters))
        assert flag == 2, flag
        assert np.linalg.norm(np.array(xs[:]) - np.asarray(ref.x)) < 1e-6
        assert abs(fval.value - float(ref.fval)) < 1e-6


@requires_gcc
def test_codegen_miqp():
    # Embedded BnB vs the JAX MIQP solver on the known-solution instance
    # (core_tests.jl:150-157) and random MIQPs
    H = np.array([[1, 0.5, 0], [0.5, 1, 0.5], [0, 0.5, 1]])
    f = np.array([1.0, 0, 0])
    A = np.array([[1.0, 2, 3], [1, 1, 0]])
    bu = np.array([1.0, 1, 1, 1e30, 1e30])
    bl = np.array([0.0, 0, 0, 4, 1])
    sense = np.array([daqp_tpu.BINARY] * 3 + [0, 0], np.int32)
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(H, f, A, bu, bl, sense=sense, ms=3,
                                 name="miqp", dir=td)
        lib = _build_and_load(cpath)
        lib.miqp_init()
        xs = (ctypes.c_double * 3)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        nodes = ctypes.c_int()
        flag = lib.miqp_solve_miqp(xs, None, ctypes.byref(fval),
                                   ctypes.byref(iters),
                                   ctypes.byref(nodes))
        assert flag == 1, flag
        assert np.linalg.norm(np.array(xs[:]) - [0, 1, 1]) < 1e-5, xs[:]
        ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=3)
        assert abs(fval.value - float(ref.fval)) < 1e-6
        assert nodes.value >= 1

    # random MIQPs against the JAX solver
    for seed in (0, 1):
        rng = np.random.default_rng(200 + seed)
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
        ref = daqp_tpu.quadprog(H, f, A, bu, bl, sense, ms=0)
        with tempfile.TemporaryDirectory() as td:
            cpath = codegen.render_c(H, f, A, bu, bl, sense=sense,
                                     name="rm", dir=td)
            lib = _build_and_load(cpath)
            lib.rm_init()
            xs = (ctypes.c_double * n)()
            fval = ctypes.c_double()
            iters = ctypes.c_int()
            flag = lib.rm_solve_miqp(xs, None, ctypes.byref(fval),
                                     ctypes.byref(iters), None)
            assert flag == int(ref.exitflag), (flag, int(ref.exitflag))
            if flag == 1:
                assert abs(fval.value - float(ref.fval)) < 1e-5, \
                    (fval.value, float(ref.fval))
                assert np.linalg.norm(np.array(xs[:])
                                      - np.asarray(ref.x)) < 1e-4


@requires_gcc
def test_codegen_hierarchical():
    # Embedded hierarchical solve vs the reference's known solutions
    # (core_tests.jl:294-302 and :348-356)
    A = np.array([[1.0, 1, 1], [1, -1, 0], [3, 1, -1]])
    bu = np.concatenate([np.ones(3), [1, 0.5, 20]])
    bl = np.concatenate([-np.ones(3), [-1e30, 0.5, 10]])
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(np.eye(3), np.zeros(3), A, bu, bl, ms=3,
                                 break_points=(3, 4, 5, 6), name="hq",
                                 dir=td)
        lib = _build_and_load(cpath)
        lib.hq_init()
        xs = (ctypes.c_double * 3)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = lib.hq_solve_hier(xs, None, ctypes.byref(fval),
                                 ctypes.byref(iters))
        assert flag > 0, flag
        assert np.linalg.norm(np.array(xs[:]) - [1.0, 0.5, -1.0]) < 1e-4, \
            xs[:]

    # conflicting equalities resolved in the least-squares sense, slack
    # duals frozen at w = lam* rho_soft (hierarchical.c:51-65)
    A = np.array([[1.0, 0], [1, 0], [0, 1]])
    b = np.array([4.0, 8.0, 1.0])
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(np.eye(2), np.zeros(2), A, b, b, ms=0,
                                 break_points=(0, 2, 3), name="ce",
                                 dir=td)
        lib = _build_and_load(cpath)
        lib.ce_init()
        xs = (ctypes.c_double * 2)()
        lam = (ctypes.c_double * 3)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = lib.ce_solve_hier(xs, lam, ctypes.byref(fval),
                                 ctypes.byref(iters))
        assert flag > 0, flag
        assert np.linalg.norm(np.array(xs[:]) - [6.0, 1.0]) < 1e-4, xs[:]
        lam = np.array(lam[:])
        assert abs(lam[0] - 2.0) < 1e-3, lam
        assert abs(lam[1] + 2.0) < 1e-3, lam


@requires_gcc
def test_codegen_degenerate_repair():
    # Duplicated rows + near-degenerate bounds: the embedded cycle guard /
    # repair ladder (daqp.c:28-85 analogue) must still exit optimally
    rng = np.random.default_rng(300)
    n, m = 8, 24
    x, H, f, A, bu, bl, sense = generate_test_qp(n, m // 2, 0, 5, 1e2, rng)
    A = np.vstack([A, A])                 # exact duplicates
    bu = np.concatenate([bu, bu])
    bl = np.concatenate([bl, bl])
    ref = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(H, f, A, bu, bl, name="dg", dir=td)
        lib = _build_and_load(cpath)
        lib.dg_init()
        xs = (ctypes.c_double * n)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = lib.dg_solve(xs, None, ctypes.byref(fval),
                            ctypes.byref(iters))
        assert flag == 1, flag
        assert np.linalg.norm(np.array(xs[:]) - np.asarray(ref.x)) < 1e-5


@requires_gcc
def test_codegen_hier_wide_level():
    # ADVICE r2 (high): a hierarchy level wider than n + 1 softens MORE
    # rows than the static-soft K sizing allowed — the old K = n + ns + 1
    # made add_constraint write out of bounds.  Four conflicting
    # equalities on x0 (n = 2) all activate as soft rows (level width 4 >
    # K - 1 = 2 under the old sizing).
    A = np.array([[1.0, 0], [1, 0], [1, 0], [1, 0], [0, 1]])
    b = np.array([1.0, 2.0, 3.0, 4.0, 1.0])
    ref = daqp_tpu.solve(H=None, f=None, A=A, bupper=b, blower=b, ms=0,
                         break_points=(0, 4, 5))
    assert int(ref.exitflag) > 0, int(ref.exitflag)
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(np.eye(2), np.zeros(2), A, b, b, ms=0,
                                 break_points=(0, 4, 5), name="wl",
                                 dir=td)
        # the rendered K must cover n + widest level + 1
        src = open(cpath).read()
        assert "#define wl_K     7" in src, \
            [l for l in src.splitlines() if "_K " in l]
        lib = _build_and_load(cpath)
        lib.wl_init()
        xs = (ctypes.c_double * 2)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = lib.wl_solve_hier(xs, None, ctypes.byref(fval),
                                 ctypes.byref(iters))
        assert flag > 0, flag
        assert np.linalg.norm(np.array(xs[:]) - np.asarray(ref.x)) < 1e-4, \
            (xs[:], ref.x)
        # least-squares mean of 1..4 up to the rho_soft regularization
        # bias (~1e-4 here)
        assert abs(xs[0] - 2.5) < 1e-3


@requires_gcc
def test_codegen_miqp_then_solve():
    # ADVICE r2 (low): _solve_miqp must not leave IMMUTABLE bits (or a
    # stale E/Mw vs the restored incumbent WS) behind — a subsequent
    # <name>_solve without <name>_init must solve the RELAXATION
    # correctly, with every binary row priced.
    rng = np.random.default_rng(207)
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
    relax = daqp_tpu.quadprog(H, f, A, bu, bl, ms=0)   # binaries relaxed
    with tempfile.TemporaryDirectory() as td:
        cpath = codegen.render_c(H, f, A, bu, bl, sense=sense,
                                 name="ms", dir=td)
        lib = _build_and_load(cpath)
        lib.ms_init()
        xs = (ctypes.c_double * n)()
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = lib.ms_solve_miqp(xs, None, ctypes.byref(fval),
                                 ctypes.byref(iters), None)
        assert flag == 1, flag
        # no init in between: plain solve must now return the relaxation
        flag = lib.ms_solve(xs, None, ctypes.byref(fval),
                            ctypes.byref(iters))
        assert flag == 1, flag
        assert abs(fval.value - float(relax.fval)) < 1e-6, \
            (fval.value, float(relax.fval))
        assert np.linalg.norm(np.array(xs[:]) - np.asarray(relax.x)) < 1e-5
