"""ctypes loader for the native C binding (``native/daqp_c.c``).

The C library is the framework's C-consumer surface with RUNTIME problem
data (the reference ships its core as a C library; here the JAX/Pallas
path is the native compute surface and this serves host-side / embedded
C callers) — see ``native/daqp_c.h``.  This module compiles it on demand
with the system C compiler and exposes a small OO wrapper whose results
are differentially tested against the JAX core (``tests/test_native_c.py``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "daqp_c.c")
_lib = None


def _build_lib():
    """Compile native/daqp_c.c into a cached shared library."""
    import hashlib
    with open(_SRC, "rb") as fh:
        tag = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), "daqp_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"libdaqp_tpu_{tag}.so")
    if not os.path.exists(so):
        cc = os.environ.get("CC", "cc")
        subprocess.run(
            [cc, "-O2", "-fPIC", "-shared", "-o", so, _SRC, "-lm"],
            check=True, cwd=_REPO)
    return so


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build_lib())
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.daqp_tpu_setup.restype = ctypes.c_void_p
    lib.daqp_tpu_setup.argtypes = [ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, dp, dp, dp, dp, dp, ip]
    lib.daqp_tpu_setup_avi.restype = ctypes.c_void_p
    lib.daqp_tpu_setup_avi.argtypes = [ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, dp, dp, dp, dp, dp,
                                       ip]
    lib.daqp_tpu_solve.restype = ctypes.c_int
    lib.daqp_tpu_solve.argtypes = [ctypes.c_void_p, dp, dp, dp, ip]
    lib.daqp_tpu_solve_miqp.restype = ctypes.c_int
    lib.daqp_tpu_solve_miqp.argtypes = [ctypes.c_void_p, dp, dp, dp, ip,
                                        ip]
    lib.daqp_tpu_solve_hiqp.restype = ctypes.c_int
    lib.daqp_tpu_solve_hiqp.argtypes = [ctypes.c_void_p, ip, ctypes.c_int,
                                        dp, dp, dp, ip]
    lib.daqp_tpu_update.restype = None
    lib.daqp_tpu_update.argtypes = [ctypes.c_void_p, dp, dp, dp]
    lib.daqp_tpu_update_masked.restype = ctypes.c_int
    lib.daqp_tpu_update_masked.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           dp, dp, dp, dp, dp, ip]
    lib.daqp_tpu_soft_slack.restype = ctypes.c_double
    lib.daqp_tpu_soft_slack.argtypes = [ctypes.c_void_p]
    lib.daqp_tpu_primal_init_active.restype = None
    lib.daqp_tpu_primal_init_active.argtypes = [ctypes.c_void_p, dp]
    lib.daqp_tpu_dual_init_active.restype = None
    lib.daqp_tpu_dual_init_active.argtypes = [ctypes.c_void_p, dp]
    lib.daqp_tpu_set_primal_start.restype = None
    lib.daqp_tpu_set_primal_start.argtypes = [ctypes.c_void_p, dp]
    lib.daqp_tpu_minrep.restype = ctypes.c_int
    lib.daqp_tpu_minrep.argtypes = [ip, dp, dp, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
    lib.daqp_tpu_set.restype = ctypes.c_int
    lib.daqp_tpu_set.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_double]
    lib.daqp_tpu_reset.restype = None
    lib.daqp_tpu_reset.argtypes = [ctypes.c_void_p]
    lib.daqp_tpu_free.restype = None
    lib.daqp_tpu_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeModel:
    """C-side QP/MIQP model: setup once, solve/update repeatedly.

    Mirrors the reference's C API life cycle (api.h setup/solve/update/
    free); ``settings`` takes the same names as :class:`daqp_tpu.Settings`.
    """

    def __init__(self, H, f, A, bupper, blower, sense=None, ms: int = 0,
                 settings: Optional[dict] = None, avi: bool = False):
        """``H=None`` selects LP mode (min f'x): the C library runs the
        adaptive-eps proximal LP regime (api.c:175-177 +
        daqp_prox.c:21-271); an unbounded LP returns exitflag -3.
        ``avi=True`` selects the affine-variational-inequality mode
        (daqp_tpu_setup_avi; H may be asymmetric, solve() dispatches to
        the DR-splitting outer loop as in reference api.c:73-77)."""
        lib = _load()
        f = np.ascontiguousarray(f, np.float64)
        A = np.ascontiguousarray(np.atleast_2d(A), np.float64)
        bu = np.ascontiguousarray(bupper, np.float64)
        bl = np.ascontiguousarray(blower, np.float64)
        n = f.shape[0] if H is None else np.asarray(H).shape[0]
        m = bu.shape[0]
        se = (np.zeros(m, np.int32) if sense is None
              else np.ascontiguousarray(sense, np.int32))
        self._lib = lib
        self.n, self.m = n, m
        nul = ctypes.POINTER(ctypes.c_double)()
        Hh = None if H is None else np.ascontiguousarray(H, np.float64)
        if avi:
            if Hh is None:
                raise ValueError("AVI mode requires H")
            setup = lib.daqp_tpu_setup_avi
        else:
            setup = lib.daqp_tpu_setup
        self._w = setup(
            n, m, ms, nul if Hh is None else _dp(Hh), _dp(f), _dp(A),
            _dp(bu), _dp(bl),
            se.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if not self._w:
            raise MemoryError("daqp_tpu_setup failed")
        for k, v in (settings or {}).items():
            if lib.daqp_tpu_set(self._w, k.encode(), float(v)) != 0:
                raise ValueError(f"unknown setting {k!r}")

    def solve(self):
        x = np.empty(self.n)
        lam = np.empty(self.m)
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = self._lib.daqp_tpu_solve(self._w, _dp(x), _dp(lam),
                                        ctypes.byref(fval),
                                        ctypes.byref(iters))
        return dict(x=x, lam=lam, fval=fval.value, exitflag=int(flag),
                    iterations=int(iters.value))

    def solve_miqp(self):
        x = np.empty(self.n)
        lam = np.empty(self.m)
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        nodes = ctypes.c_int()
        flag = self._lib.daqp_tpu_solve_miqp(
            self._w, _dp(x), _dp(lam), ctypes.byref(fval),
            ctypes.byref(iters), ctypes.byref(nodes))
        return dict(x=x, lam=lam, fval=fval.value, exitflag=int(flag),
                    iterations=int(iters.value), nodes=int(nodes.value))

    def solve_hiqp(self, break_points):
        """Lexicographic hierarchical solve (hierarchical.c:5-108).

        ``break_points[i]`` = one-past-the-end constraint index of level
        i (ascending; last entry == m).  Exit 3 = degrees of freedom
        exhausted before the last level."""
        bp = np.ascontiguousarray(break_points, np.int32)
        x = np.empty(self.n)
        lam = np.empty(self.m)
        fval = ctypes.c_double()
        iters = ctypes.c_int()
        flag = self._lib.daqp_tpu_solve_hiqp(
            self._w, bp.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            int(bp.shape[0]), _dp(x), _dp(lam), ctypes.byref(fval),
            ctypes.byref(iters))
        return dict(x=x, lam=lam, fval=fval.value, exitflag=int(flag),
                    iterations=int(iters.value))

    def update(self, f=None, bupper=None, blower=None):
        """v/d-only MPC re-update (UPDATE_v | UPDATE_d)."""
        nul = ctypes.POINTER(ctypes.c_double)()
        # keep the arrays alive in locals across the C call (a bare
        # _dp(temporary) would dangle)
        fh = None if f is None else np.ascontiguousarray(f, np.float64)
        buh = None if bupper is None else np.ascontiguousarray(
            bupper, np.float64)
        blh = None if blower is None else np.ascontiguousarray(
            blower, np.float64)
        self._lib.daqp_tpu_update(
            self._w,
            nul if fh is None else _dp(fh),
            nul if buh is None else _dp(buh),
            nul if blh is None else _dp(blh))

    # update masks (native/daqp_c.h, reference constants.h:48-54)
    UPDATE_Rinv, UPDATE_M, UPDATE_v, UPDATE_d, UPDATE_sense = \
        1, 2, 4, 8, 16

    def update_masked(self, H=None, f=None, A=None, bupper=None,
                      blower=None, sense=None, mask=None):
        """Masked in-place re-setup (the reference daqp_update_ldp
        pipeline, utils.c:14-135): pass only the changed fields; the
        mask defaults to the union implied by the given arguments.
        An M/Rinv/sense change resets the working set (utils.c:381);
        a pure v/d change keeps it (the MPC contract)."""
        if mask is None:
            mask = ((self.UPDATE_Rinv if H is not None else 0)
                    | (self.UPDATE_M if A is not None else 0)
                    | (self.UPDATE_v if f is not None else 0)
                    | (self.UPDATE_d if bupper is not None
                       or blower is not None else 0)
                    | (self.UPDATE_sense if sense is not None else 0))
        nul = ctypes.POINTER(ctypes.c_double)()
        nuli = ctypes.POINTER(ctypes.c_int)()
        Hh = None if H is None else np.ascontiguousarray(H, np.float64)
        fh = None if f is None else np.ascontiguousarray(f, np.float64)
        Ah = None if A is None else np.ascontiguousarray(
            np.atleast_2d(A), np.float64)
        buh = None if bupper is None else np.ascontiguousarray(
            bupper, np.float64)
        blh = None if blower is None else np.ascontiguousarray(
            blower, np.float64)
        seh = None if sense is None else np.ascontiguousarray(
            sense, np.int32)
        rc = self._lib.daqp_tpu_update_masked(
            self._w, int(mask),
            nul if Hh is None else _dp(Hh),
            nul if fh is None else _dp(fh),
            nul if Ah is None else _dp(Ah),
            nul if buh is None else _dp(buh),
            nul if blh is None else _dp(blh),
            nuli if seh is None else seh.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int)))
        if rc == -100:                       # DAQP_TPU_BADMASK
            raise ValueError("invalid update mask for this workspace")
        return int(rc)

    def soft_slack(self):
        """rho_soft * sum lam_soft^2 of the last solve (the reference
        DAQPResult.soft_slack, api.c:441-471)."""
        return float(self._lib.daqp_tpu_soft_slack(self._w))

    def primal_init_active(self, x):
        """Activate constraints near-tight at x (api.c:555-592)."""
        xh = np.ascontiguousarray(x, np.float64)
        self._lib.daqp_tpu_primal_init_active(self._w, _dp(xh))

    def dual_init_active(self, lam):
        """Activate constraints by multiplier sign (api.c:596-609)."""
        lh = np.ascontiguousarray(lam, np.float64)
        self._lib.daqp_tpu_dual_init_active(self._w, _dp(lh))

    def set_primal_start(self, x):
        """Seed the proximal/LP outer iterate (api.c:612-617)."""
        xh = np.ascontiguousarray(x, np.float64)
        self._lib.daqp_tpu_set_primal_start(self._w, _dp(xh))

    def reset(self):
        self._lib.daqp_tpu_reset(self._w)

    def __del__(self):
        try:
            if getattr(self, "_w", None):
                self._lib.daqp_tpu_free(self._w)
                self._w = None
        except Exception:
            pass


def native_minrep(A, b, ms: int = 0):
    """Minimal representation of {x : x[:ms] <= b[:ms], A x <= b[ms:]}
    through the C library (reference daqp_minrep, api.c:507-534);
    returns an (m,) int array, 1 = redundant.  Differentially tested
    against the vmapped JAX ``geometry.minrep``."""
    lib = _load()
    A = np.ascontiguousarray(np.atleast_2d(A), np.float64)
    b = np.ascontiguousarray(b, np.float64)
    m = b.shape[0]
    n = A.shape[1]
    red = np.empty(m, np.int32)
    rc = lib.daqp_tpu_minrep(
        red.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _dp(A), _dp(b), n, m, int(ms))
    if rc != 0:
        raise RuntimeError(f"daqp_tpu_minrep failed (flag {rc})")
    return red
