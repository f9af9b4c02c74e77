"""Embedded code generation: render a solved-offline QP into standalone C.

Reference: ``codegen/codegen.c`` (render_daqp_workspace, :11-82) — the
reference emits its static workspace and compiles it together with its C
solver sources for malloc-free embedded deployment (used by LinearMPC /
lmpc; tested by compiling with gcc and re-solving through the shared
library, core_tests.jl:253-291).

This framework's compute path is JAX/Pallas, so its codegen ships BOTH
deployment targets:

  * :func:`render_c` — a SELF-CONTAINED C99 file (plus header) holding the
    transformed LDP data (M, d, Rinv, v, scaling, sense) as static arrays
    and a fresh, malloc-free C implementation of the same
    explicit-inverse dual active-set algorithm the JAX solver uses
    (bordered-inverse add, deletion-inverse remove — NOT the reference's
    packed-LDL code).  API: ``<name>_solve`` / ``<name>_update`` (the
    v/d-only MPC re-update, utils.c:410-455 semantics) /
    ``<name>_settings``.  No dependencies beyond libm.

  * :func:`export_aot` — ahead-of-time lowering of the jitted TPU solver
    for fixed dimensions to serialized StableHLO (the TPU-native analogue
    of freezing the workspace: load and execute later without retracing).
"""
from __future__ import annotations

import os
import textwrap

import numpy as np


def _carr(name, arr, const=True, dtype="double"):
    arr = np.asarray(arr)
    flat = arr.reshape(-1)
    if dtype == "int":
        body = ",".join(str(int(v)) for v in flat)
    else:
        body = ",".join(f"{float(v):.17g}" for v in flat)
    qual = "static const" if const else "static"
    return f"{qual} {dtype} {name}[{max(flat.size, 1)}] = {{{body}}};"


_C_SOLVER = r"""
/* --- embedded dual active-set LDP solver (explicit inverse form) ---------
 * Solves  min 0.5 x'Hx + f'x  s.t. bl <= [x[:MS]; A x] <= bu  via the
 * least-distance transform prepared offline:  M u in [dl, du],
 * x = Rinv (u - v).  Working-set Gram inverse E is maintained by
 * bordered addition / deletion rank-one updates.  Malloc-free.
 */
#include <math.h>

#define PNAME_N     {n}
#define PNAME_M     {m}
#define PNAME_K     {K}
#define PNAME_INF   1e30

{data_arrays}

static double PNAME_dupper[PNAME_M];
static double PNAME_dlower[PNAME_M];
static double PNAME_v[PNAME_N];
static int    PNAME_sense[PNAME_M];

/* workspace */
static double E[PNAME_K * PNAME_K];
static double Mw[PNAME_K * PNAME_N];
static double lam[PNAME_K];
static double lam_star[PNAME_K];
static int    WS[PNAME_K];
static double u_vec[PNAME_N];
static int    n_active = 0;
static int    sing_flag = 0;
static double sing_dir[PNAME_K];

static double ptol = {primal_tol};
static double dtol = {dual_tol};
static double stol = {sing_tol};
static int    iter_limit = {iter_limit};

void PNAME_settings(double primal_tol_, double dual_tol_, int iter_limit_)
{{
    ptol = primal_tol_; dual_tol_ = dual_tol_ > 0 ? dual_tol_ : dtol;
    dtol = dual_tol_; iter_limit = iter_limit_;
}}

/* v/d-only re-update for MPC loops: f and bounds change, factorization,
 * working set and E persist (reference mask UPDATE_v|UPDATE_d). */
void PNAME_update(const double *f, const double *bupper,
                  const double *blower)
{{
    int i, j;
    for (i = 0; i < PNAME_N; i++) {{
        double s = 0.0;
        for (j = 0; j < PNAME_N; j++)
            s += PNAME_Rinv[j * PNAME_N + i] * f[j];  /* v = Rinv' f */
        PNAME_v[i] = s;
    }}
    for (i = 0; i < PNAME_M; i++) {{
        double mv = 0.0;
        for (j = 0; j < PNAME_N; j++)
            mv += PNAME_Mmat[i * PNAME_N + j] * PNAME_v[j];
        PNAME_dupper[i] = bupper[i] * PNAME_scaling[i] + mv;
        PNAME_dlower[i] = blower[i] * PNAME_scaling[i] + mv;
    }}
}}

static void reset_ws(void)
{{
    int i;
    n_active = 0; sing_flag = 0;
    for (i = 0; i < PNAME_K * PNAME_K; i++) E[i] = 0.0;
    for (i = 0; i < PNAME_M; i++) PNAME_sense[i] &= ~1;
}}

/* bordered-inverse addition; returns 0 ok, 1 singular (entry appended,
 * flagged) */
static int add_constraint(int id, double lam0)
{{
    int i, j, k = n_active;
    double g[PNAME_K], a[PNAME_K], dii = 0.0, sval;
    const double *mi = &PNAME_Mmat[id * PNAME_N];
    for (i = 0; i < PNAME_N; i++) dii += mi[i] * mi[i];
    for (i = 0; i < k; i++) {{
        double s = 0.0;
        for (j = 0; j < PNAME_N; j++) s += Mw[i * PNAME_N + j] * mi[j];
        g[i] = s;
    }}
    for (i = 0; i < k; i++) {{
        double s = 0.0;
        for (j = 0; j < k; j++) s += E[i * PNAME_K + j] * g[j];
        a[i] = s;
    }}
    sval = dii;
    for (i = 0; i < k; i++) sval -= g[i] * a[i];

    WS[k] = id; lam[k] = lam0;
    for (i = 0; i < PNAME_N; i++) Mw[k * PNAME_N + i] = mi[i];
    PNAME_sense[id] |= 1;
    n_active = k + 1;
    if (sval < stol || k >= PNAME_N) {{
        for (i = 0; i < k; i++) sing_dir[i] = -a[i];
        sing_dir[k] = 1.0;
        if (PNAME_sense[id] & 2)
            for (i = 0; i <= k; i++) sing_dir[i] = -sing_dir[i];
        sing_flag = 1;
        return 1;
    }}
    for (i = 0; i < k; i++) {{      /* E += w w'/s, w = [a; -1] */
        for (j = 0; j < k; j++)
            E[i * PNAME_K + j] += a[i] * a[j] / sval;
        E[i * PNAME_K + k] = -a[i] / sval;
        E[k * PNAME_K + i] = -a[i] / sval;
    }}
    E[k * PNAME_K + k] = 1.0 / sval;
    sing_flag = 0;
    return 0;
}}

static void remove_constraint(int pos)
{{
    int i, j, k = n_active;
    int was_sing = sing_flag;
    int k_ns = k - (was_sing ? 1 : 0);
    PNAME_sense[WS[pos]] &= ~1;
    if (pos < k_ns) {{             /* deletion-inverse update */
        double e_[PNAME_K], err = E[pos * PNAME_K + pos];
        for (i = 0; i < k_ns; i++) e_[i] = E[i * PNAME_K + pos];
        for (i = 0; i < k_ns; i++)
            for (j = 0; j < k_ns; j++)
                E[i * PNAME_K + j] -= e_[i] * e_[j] / err;
        for (i = pos; i < k_ns - 1; i++)       /* compact rows/cols */
            for (j = 0; j < k_ns; j++)
                E[i * PNAME_K + j] = E[(i + 1) * PNAME_K + j];
        for (j = pos; j < k_ns - 1; j++)
            for (i = 0; i < k_ns; i++)
                E[i * PNAME_K + j] = E[i * PNAME_K + (j + 1)];
    }}
    for (i = pos; i < k - 1; i++) {{
        WS[i] = WS[i + 1]; lam[i] = lam[i + 1];
        for (j = 0; j < PNAME_N; j++)
            Mw[i * PNAME_N + j] = Mw[(i + 1) * PNAME_N + j];
    }}
    n_active = k - 1;
    sing_flag = 0;
    if (was_sing && pos < k - 1) {{ /* re-add the parked singular entry */
        int last = n_active - 1;
        int id2 = WS[last]; double l2 = lam[last];
        n_active = last;
        add_constraint(id2, l2);
    }}
}}

int PNAME_solve(double *x, double *lam_out, double *fval, int *iters)
{{
    int it, i, j;
    for (it = 0; it < iter_limit; it++) {{
        int k = n_active, rm = -1;
        double amin = PNAME_INF;
        if (!sing_flag) {{          /* CSP: lam* = -E d_W */
            for (i = 0; i < k; i++) {{
                double d = (PNAME_sense[WS[i]] & 2) ?
                    PNAME_dlower[WS[i]] : PNAME_dupper[WS[i]];
                lam_star[i] = d;
            }}
            for (i = 0; i < k; i++) {{
                double s = 0.0;
                for (j = 0; j < k; j++)
                    s += E[i * PNAME_K + j] * lam_star[j];
                sing_dir[i] = -s;   /* reuse as temp */
            }}
            for (i = 0; i < k; i++) lam_star[i] = sing_dir[i];
        }}
        /* blocking min-ratio over dual-infeasible entries */
        for (i = 0; i < k; i++) {{
            double dir = sing_flag ? sing_dir[i] : lam_star[i];
            double del = sing_flag ? sing_dir[i] : lam_star[i] - lam[i];
            int lower = PNAME_sense[WS[i]] & 2;
            if (PNAME_sense[WS[i]] & 4) continue;
            if ((lower && dir > dtol) || (!lower && dir < -dtol)) {{
                double r = (del != 0.0) ? -lam[i] / del : PNAME_INF;
                if (r < amin) {{ amin = r; rm = i; }}
            }}
        }}
        if (rm >= 0) {{
            for (i = 0; i < k; i++)
                lam[i] += amin * (sing_flag ? sing_dir[i]
                                            : lam_star[i] - lam[i]);
            remove_constraint(rm);
            continue;
        }}
        if (sing_flag) {{ *iters = it + 1; return -1; }}  /* infeasible */

        /* primal u = -Mw' lam*, then price all constraints */
        for (j = 0; j < PNAME_N; j++) u_vec[j] = 0.0;
        for (i = 0; i < k; i++)
            for (j = 0; j < PNAME_N; j++)
                u_vec[j] -= Mw[i * PNAME_N + j] * lam_star[i];
        {{
            int jbest = -1, blower = 0; double worst = 0.0;
            for (i = 0; i < PNAME_M; i++) {{
                double mu = 0.0, vu, vl;
                if (PNAME_sense[i] & (1 | 4)) continue;
                for (j = 0; j < PNAME_N; j++)
                    mu += PNAME_Mmat[i * PNAME_N + j] * u_vec[j];
                vu = PNAME_dupper[i] - mu;
                vl = mu - PNAME_dlower[i];
                if (vu < -ptol * PNAME_scaling[i] && vu < worst) {{
                    worst = vu; jbest = i; blower = 0;
                }} else if (vl < -ptol * PNAME_scaling[i] && vl < worst) {{
                    worst = vl; jbest = i; blower = 1;
                }}
            }}
            if (jbest < 0) {{       /* optimal */
                double fv = 0.0;
                for (j = 0; j < PNAME_N; j++) {{
                    double s = 0.0;
                    for (i = 0; i < PNAME_N; i++)
                        s += PNAME_Rinv[j * PNAME_N + i]
                             * (u_vec[i] - PNAME_v[i]);
                    x[j] = s;
                    fv += u_vec[j] * u_vec[j] - PNAME_v[j] * PNAME_v[j];
                }}
                *fval = 0.5 * fv;
                if (lam_out) {{
                    for (i = 0; i < PNAME_M; i++) lam_out[i] = 0.0;
                    for (i = 0; i < k; i++)
                        lam_out[WS[i]] = lam_star[i]
                            * PNAME_scaling[WS[i]];
                }}
                *iters = it + 1;
                return 1;
            }}
            for (i = 0; i < k; i++) lam[i] = lam_star[i];
            if (blower) PNAME_sense[jbest] |= 2;
            else PNAME_sense[jbest] &= ~2;
            add_constraint(jbest, blower ? -1.0 : 1.0);
        }}
    }}
    *iters = iter_limit;
    return -4;
}}

void PNAME_reset(void) {{ reset_ws(); }}
"""


def render_c(H, f, A, bupper, blower, name="daqp_embedded", dir=".",
             sense=None, ms=0, settings=None):
    """Emit ``<dir>/<name>.c`` and ``<dir>/<name>.h``: a standalone
    malloc-free C solver with the QP->LDP transform baked in as static
    data (reference ``render_daqp_workspace``, codegen/codegen.c:11-82).

    Returns the path of the generated .c file.
    """
    import jax
    import jax.numpy as jnp
    from . import transform
    from .api import _as_settings

    st = _as_settings(settings, jnp.float64)
    with jax.default_matmul_precision('highest'):
        ldpd = transform.build_ldp(
            jnp.asarray(H, jnp.float64), jnp.asarray(f, jnp.float64),
            jnp.asarray(A, jnp.float64), jnp.asarray(bupper, jnp.float64),
            jnp.asarray(blower, jnp.float64),
            None if sense is None else jnp.asarray(sense, jnp.int32),
            ms, st)
    M = np.asarray(ldpd.M)
    m, n = M.shape
    K = n + 1

    data = "\n".join([
        _carr("PNAME_Mmat", M),
        _carr("PNAME_Rinv", np.asarray(ldpd.Rinv)),
        _carr("PNAME_scaling", np.asarray(ldpd.scaling)),
        _carr("PNAME_dupper0", np.asarray(ldpd.dupper)),
        _carr("PNAME_dlower0", np.asarray(ldpd.dlower)),
        _carr("PNAME_v0", np.asarray(ldpd.v)),
        _carr("PNAME_sense0", np.asarray(ldpd.sense), dtype="int"),
    ])

    body = _C_SOLVER.format(
        n=n, m=m, K=K, data_arrays=data,
        primal_tol=float(st.primal_tol), dual_tol=float(st.dual_tol),
        sing_tol=float(st.sing_tol), iter_limit=int(st.iter_limit))

    init = textwrap.dedent(f"""
    /* one-time static init of the mutable problem vectors */
    void PNAME_init(void)
    {{
        int i;
        for (i = 0; i < PNAME_M; i++) {{
            PNAME_dupper[i] = PNAME_dupper0[i];
            PNAME_dlower[i] = PNAME_dlower0[i];
            PNAME_sense[i] = PNAME_sense0[i];
        }}
        for (i = 0; i < PNAME_N; i++) PNAME_v[i] = PNAME_v0[i];
        PNAME_reset();
    }}
    """)
    src = (body + init).replace("PNAME", name)

    hdr = textwrap.dedent(f"""
    #ifndef {name.upper()}_H
    #define {name.upper()}_H
    /* generated by daqp_tpu.codegen.render_c — self-contained embedded
     * QP solver; no dependencies beyond libm. */
    #define {name}_NX {n}
    #define {name}_NCONSTR {m}
    void {name}_init(void);
    void {name}_reset(void);
    void {name}_update(const double *f, const double *bupper,
                       const double *blower);
    void {name}_settings(double primal_tol, double dual_tol,
                         int iter_limit);
    int {name}_solve(double *x, double *lam, double *fval, int *iters);
    #endif
    """)

    os.makedirs(dir, exist_ok=True)
    cpath = os.path.join(dir, f"{name}.c")
    with open(cpath, "w") as fh:
        fh.write(src)
    with open(os.path.join(dir, f"{name}.h"), "w") as fh:
        fh.write(hdr)
    return cpath


def export_aot(n, m, ms=0, batch=None, dtype="float32", settings=None,
               path=None):
    """AOT-export the jitted solver for fixed dimensions as serialized
    StableHLO (the TPU-native 'frozen workspace': reload with
    ``jax.export`` and execute without retracing).

    Returns the serialized bytes (and writes them to ``path`` if given).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from .api import _as_settings, _solve_jit
    from . import batch as batch_mod

    dt = jnp.float32 if dtype == "float32" else jnp.float64
    st = _as_settings(settings, dt)
    mg = m - ms
    def public(out):
        # plain-dict result: custom NamedTuples are not serializable by
        # jax.export without registration
        return {"x": out.x, "lam": out.lam, "fval": out.fval,
                "exitflag": out.exitflag, "iterations": out.iterations}

    if batch is None:
        def fn(H, f, A, bu, bl, sense):
            return public(_solve_jit(H, f, A, bu, bl, sense, st, ms, False,
                                     (), None, False, jnp.zeros((n,), dt),
                                     None, n + 1))
        args = (jax.ShapeDtypeStruct((n, n), dt),
                jax.ShapeDtypeStruct((n,), dt),
                jax.ShapeDtypeStruct((mg, n), dt),
                jax.ShapeDtypeStruct((m,), dt),
                jax.ShapeDtypeStruct((m,), dt),
                jax.ShapeDtypeStruct((m,), jnp.int32))
    else:
        def fn(H, f, A, bu, bl, sense):
            return public(batch_mod.solve_batch_flat_jit(
                H, f, A, bu, bl, sense, st, ms=ms))
        args = (jax.ShapeDtypeStruct((batch, n, n), dt),
                jax.ShapeDtypeStruct((batch, n), dt),
                jax.ShapeDtypeStruct((batch, mg, n), dt),
                jax.ShapeDtypeStruct((batch, m), dt),
                jax.ShapeDtypeStruct((batch, m), dt),
                jax.ShapeDtypeStruct((batch, m), jnp.int32))

    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as fh:
            fh.write(blob)
    return blob
