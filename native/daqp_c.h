/* daqp_tpu native C binding — a runtime-parameterized C implementation of
 * the framework's explicit-inverse dual active-set solver.
 *
 * Role: the C-consumer surface of the framework (the reference ships its
 * core AS a C library with Julia/MATLAB/Simulink/Eigen bindings layered on
 * top, interfaces/; here the JAX/Pallas path is the native compute surface
 * and this library serves host-side / embedded C callers with RUNTIME
 * problem data — complementing codegen.render_c, which bakes ONE problem
 * into a malloc-free file).  Same algorithm family as the JAX core
 * (bordered-inverse add / deletion-inverse remove; reference semantics
 * anchored at src/daqp.c, src/auxiliary.c, src/factorization.c,
 * src/utils.c, src/bnb.c) — an independent realization, not a copy of the
 * reference's packed-LDL code.
 *
 * API shape mirrors the reference's C API (include/api.h: setup / solve /
 * update / settings / free).  Thread-safety: one DAQPTpuWork per thread.
 */
#ifndef DAQP_TPU_C_H
#define DAQP_TPU_C_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct DAQPTpuWork DAQPTpuWork;

/* sense bits (types.py / reference constants.h) */
#define DAQP_TPU_ACTIVE      1
#define DAQP_TPU_LOWER       2
#define DAQP_TPU_IMMUTABLE   4
#define DAQP_TPU_SOFT        8
#define DAQP_TPU_BINARY     16

/* exit flags (daqp_tpu/types.py) */
#define DAQP_TPU_SOFT_OPTIMAL   2
#define DAQP_TPU_OPTIMAL        1
#define DAQP_TPU_INFEASIBLE    -1
#define DAQP_TPU_CYCLE         -2
#define DAQP_TPU_UNBOUNDED     -3
#define DAQP_TPU_ITERLIMIT     -4
#define DAQP_TPU_NONCONVEX     -5
#define DAQP_TPU_OVERDETERMINED -6
#define DAQP_TPU_TIMELIMIT     -7

/* Allocate + transform: QP  min 0.5 x'Hx + f'x
 *   s.t. blower <= [x[0:ms]; A x] <= bupper   (A is (m-ms) x n row-major)
 * sense: m ints (bits above) or NULL.  Semidefinite H gets the reference's
 * retry-doubling full proximal shift (utils.c:253-283) baked into the
 * factorization (single-shift approximation of the outer loop; exact for
 * PD H).  H == NULL selects LP mode: min f'x, solved by the adaptive-eps
 * proximal smoothing regime with gradient-step ray jumps (the reference
 * sets n_prox = n at api.c:175-177 and runs daqp_prox.c:21-271; unbounded
 * LPs exit DAQP_TPU_UNBOUNDED).  Returns NULL on allocation failure; a
 * factorization failure is reported by daqp_tpu_solve as NONCONVEX. */
DAQPTpuWork *daqp_tpu_setup(int n, int m, int ms,
                            const double *H, const double *f,
                            const double *A, const double *bupper,
                            const double *blower, const int *sense);

/* Affine variational inequality setup (reference avi.c:6-221 +
 * utils.c:600-638): find x in P = {x : blower <= [x[:ms]; A x] <= bupper}
 * with (H x + f)'(y - x) >= 0 for all y in P, H possibly ASYMMETRIC.
 * Douglas-Rachford splitting over a warm inner projection LDP in the
 * sym(H) + rho*I metric (rho = sqrt(min_diag(symH) * max_row_sum(symH))
 * or ||H||_F/2), with exact-KKT acceleration on the original H once the
 * inner active set is stable and Newton-step reverts on residual growth.
 * Solve with daqp_tpu_solve (it dispatches on the AVI workspace, matching
 * the reference api.c:73-77); returned lam is in the original constraint
 * space (unscaled KKT duals).  A singular H is reported as NONCONVEX.
 * The outer iterate persists across solves (warm start). */
DAQPTpuWork *daqp_tpu_setup_avi(int n, int m, int ms,
                                const double *H, const double *f,
                                const double *A, const double *bupper,
                                const double *blower, const int *sense);

/* Solve from the current workspace state (warm if a previous solve left an
 * active set and only v/d changed via daqp_tpu_update).  x: n, lam: m (or
 * NULL), fval/iters: scalars. */
int daqp_tpu_solve(DAQPTpuWork *w, double *x, double *lam, double *fval,
                   int *iters);

/* Hierarchical least-squares QP (lexicographic level walk,
 * hierarchical.c:5-108): break_points[i] = one-past-the-end constraint
 * index of level i (ascending, break_points[nh-1] == m).  Levels are
 * softened, solved, frozen into d at their optimal violation, then
 * hardened (IMMUTABLE) with dependent rows dropped; stops early when
 * the n degrees of freedom are exhausted.  Exit 3 = ran out of DOF
 * before the last level (x holds the last fully-solved level's point).
 * lam holds the frozen per-level soft weights (rho_soft * lam_level). */
int daqp_tpu_solve_hiqp(DAQPTpuWork *w, const int *break_points, int nh,
                        double *x, double *lam, double *fval, int *iters);

/* Branch-and-bound over the BINARY-flagged rows (bnb.c semantics: DFS,
 * midpoint branching, nearest endpoint first, incumbent dominance bound,
 * rel/abs suboptimality folding via settings). */
int daqp_tpu_solve_miqp(DAQPTpuWork *w, double *x, double *lam,
                        double *fval, int *iters, int *nodes);

/* v/d-only re-update for MPC loops (UPDATE_v | UPDATE_d, utils.c:410-455):
 * factorization, working set and E persist. */
void daqp_tpu_update(DAQPTpuWork *w, const double *f,
                     const double *bupper, const double *blower);

/* Named settings: primal_tol, dual_tol, zero_tol, pivot_tol, progress_tol,
 * sing_tol, refactor_tol, rho_soft, fval_bound, rel_subopt, abs_subopt,
 * cycle_tol, iter_limit, eps_prox, eta_prox (< 0 = auto, daqp_prox.c:43-48),
 * time_limit (seconds of wall clock, 0 = off; checked every 32 inner
 * iterations / 32 BnB nodes, daqp.c:95-103 + bnb.c:51-59).
 * Returns 0, or -1 for an unknown name. */
int daqp_tpu_set(DAQPTpuWork *w, const char *name, double value);

/* Reset the working set (cold restart). */
void daqp_tpu_reset(DAQPTpuWork *w);

void daqp_tpu_free(DAQPTpuWork *w);

#ifdef __cplusplus
}
#endif
#endif
