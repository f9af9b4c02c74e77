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

/* update masks (reference constants.h:48-54) */
#define DAQP_TPU_UPDATE_Rinv   1
#define DAQP_TPU_UPDATE_M      2
#define DAQP_TPU_UPDATE_v      4
#define DAQP_TPU_UPDATE_d      8
#define DAQP_TPU_UPDATE_sense 16

/* Masked in-place re-setup (the reference's daqp_update_ldp pipeline,
 * utils.c:14-135): pass the union of DAQP_TPU_UPDATE_* bits and the new
 * data for the masked fields (unused pointers may be NULL; unmasked data
 * persists from setup).  Semantics:
 *   Rinv  — refactorize from the new H (retry-doubling shift); implies
 *           M and v rebuilds (both depend on R^-1).  Invalid for LP-mode
 *           or AVI workspaces (returns -1).
 *   M     — rebuild M = A R^-1 against the CACHED factorization
 *           (utils.c:345-383), renormalize rows, reset the working set
 *           ("internal factorizations need to be redone", utils.c:381).
 *   v     — v = R^-T f; d is recomputed (it embeds M v).
 *   d     — new bounds; with neither Rinv/M/sense set the working set
 *           persists (the MPC contract, same as daqp_tpu_update).
 *   sense — new sense bits; equality auto-detection re-runs and ACTIVE
 *           rows are (re)activated at the next solve.
 * Returns 0, INFEASIBLE on trivially-inconsistent bounds, NONCONVEX on
 * factorization failure, DAQP_TPU_BADMASK on an invalid mask for this
 * workspace (AVI, or Rinv update in LP mode). */
#define DAQP_TPU_BADMASK      -100
int daqp_tpu_update_masked(DAQPTpuWork *w, int mask, const double *H,
                           const double *f, const double *A,
                           const double *bupper, const double *blower,
                           const int *sense);

/* Soft-constraint slack measure of the last solve (reference
 * DAQPResult.soft_slack, api.c:441-471): rho_soft * sum lam_soft^2 over
 * the active soft rows — 0 when no soft constraint is violated. */
double daqp_tpu_soft_slack(const DAQPTpuWork *w);

/* Warm-start helpers (reference api.c:555-617).  primal_init_active
 * activates (in sense) every mutable constraint within 1e-9 of a bound
 * at the point x (n + general rows need the A kept from setup);
 * dual_init_active activates by multiplier sign (lam is m user-space
 * duals: > 0 upper, < 0 lower, tol 1e-12).  Activation itself happens at
 * the next daqp_tpu_solve.  set_primal_start seeds the proximal / LP
 * outer iterate (reference daqp_set_primal_start, api.c:612-617). */
void daqp_tpu_primal_init_active(DAQPTpuWork *w, const double *x);
void daqp_tpu_dual_init_active(DAQPTpuWork *w, const double *lam);
void daqp_tpu_set_primal_start(DAQPTpuWork *w, const double *x);

/* Minimal representation of {x : x[0:ms] <= b[0:ms], A x <= b[ms:m]}
 * (reference daqp_minrep, api.c:507-534 + utils.c:699-726): constraint i
 * is redundant iff forcing it active makes the feasibility LDP
 * infeasible.  is_redundant[i] in {1, 0}.  A is (m-ms) x n row-major.
 * Returns 0, or a negative exit flag on setup failure. */
int daqp_tpu_minrep(int *is_redundant, const double *A, const double *b,
                    int n, int m, int ms);

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
