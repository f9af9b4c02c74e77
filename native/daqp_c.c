/* daqp_tpu native C binding — implementation.  See daqp_c.h.
 *
 * Explicit-inverse dual active-set LDP solver with the QP->LDP transform
 * done at setup time in C (the runtime-parameterized sibling of the
 * codegen template in daqp_tpu/codegen.py; same algorithm as the JAX
 * core).  Reference semantic anchors per function below.
 */
#include <math.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "daqp_c.h"

#define DINF 1e30

/* monotonic wall clock in seconds (reference PROFILING timers,
 * utils.c:729-763) */
static double now_sec(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

struct DAQPTpuWork {
    int n, m, ms, K, nb;
    int err0;                 /* setup-time error (0 ok) */
    /* transformed problem data */
    double *M;                /* m x n normalized rows */
    double *Rinv;             /* n x n upper */
    double *scaling;          /* m */
    double *du, *dl;          /* m (current) */
    double *du0, *dl0;        /* m (as set up; update() rewrites du/dl) */
    double *v;                /* n */
    int *sense, *sense0;      /* m */
    int *bin_ids;             /* nb */
    /* workspace */
    double *E;                /* K x K */
    double *Mw;               /* K x n */
    double *lam, *lam_star;   /* K */
    int *WS;                  /* K */
    double *u;                /* n */
    double *sdir;             /* K scratch / singular direction */
    double *scr1, *scr2;      /* K scratch (add/remove/refine temps) */
    int *iscr;                /* K scratch (refactor ids) */
    int n_active, ns_active, sing_flag;
    double last_fv, last_ss;
    int m_price;
    /* LP mode (H == NULL at setup: Rinv = I, proximal smoothing) */
    int lp_mode;
    double *f_user;           /* n: raw f for LP v re-forms + fval */
    double *bu_user, *bl_user;  /* m: raw bounds for d re-forms */
    double *A_user;           /* (m-ms) x n: raw rows (masked updates +
                                 primal_init_active need them) */
    int *sense_user;          /* m: raw sense as given (derived bits —
                                 auto-equality, zero-row IMMUTABLE — are
                                 recomputed from this on masked updates) */
    double *x_lp;             /* n: outer iterate */
    double lp_eps;            /* eps at exit (dual rescale) */
    /* AVI mode (daqp_tpu_setup_avi): DR splitting over the projection
     * LDP in the sym(H)+rho*I metric, exact-KKT acceleration on the
     * ORIGINAL asymmetric H (avi.c:6-221, utils.c:600-636) */
    int avi_mode;
    double avi_rho;
    double *avi_H;            /* n x n original (possibly asymmetric) */
    double *avi_Hsym;         /* n x n sym(H) */
    double *avi_A;            /* (m-ms) x n original rows */
    double *avi_LUH;          /* n x n LU of H */
    double *avi_LUHr;         /* n x n LU of H + rho I */
    int *avi_piv, *avi_pivr;  /* n pivots */
    double *avi_x, *avi_y, *avi_yold, *avi_xt, *avi_t1, *avi_t2; /* n */
    double *avi_kkt;          /* K*K + K Schur buffer (S | rhs) */
    int *avi_kpiv;            /* K */
    /* settings (reference defaults, constants.h / types.py) */
    double ptol, dtol, ztol, pivtol, progtol, singtol, rftol, rho_soft;
    double fval_bound, rel_subopt, abs_subopt, eps_prox, eta_prox;
    double time_limit, deadline;
    int cyc_tol, iter_limit;
};

/* dense LU with partial pivoting, row-major in place; 0 ok, 1 singular */
static int lu_fact(int n, double *Am, int *piv)
{
    int i, j, k;
    for (k = 0; k < n; k++) {
        int p = k;
        double mx = fabs(Am[k * n + k]);
        for (i = k + 1; i < n; i++)
            if (fabs(Am[i * n + k]) > mx) { mx = fabs(Am[i * n + k]); p = i; }
        piv[k] = p;
        if (mx == 0.0) return 1;
        if (p != k)
            for (j = 0; j < n; j++) {
                double t = Am[k * n + j];
                Am[k * n + j] = Am[p * n + j];
                Am[p * n + j] = t;
            }
        for (i = k + 1; i < n; i++) {
            double l = Am[i * n + k] / Am[k * n + k];
            Am[i * n + k] = l;
            for (j = k + 1; j < n; j++) Am[i * n + j] -= l * Am[k * n + j];
        }
    }
    return 0;
}

static void lu_solve(int n, const double *LU, const int *piv,
                     const double *b, double *x)
{
    int i, j;
    for (i = 0; i < n; i++) x[i] = b[i];
    for (i = 0; i < n; i++) {
        if (piv[i] != i) {
            double t = x[i]; x[i] = x[piv[i]]; x[piv[i]] = t;
        }
        for (j = 0; j < i; j++) x[i] -= LU[i * n + j] * x[j];
    }
    for (i = n - 1; i >= 0; i--) {
        for (j = i + 1; j < n; j++) x[i] -= LU[i * n + j] * x[j];
        x[i] /= LU[i * n + i];
    }
}

/* ---------- setup: factorization + transform (utils.c:14-297) ---------- */

/* upper-Cholesky H = R'R in place into R (row-major, upper); returns 0 ok */
static int chol_upper(int n, const double *H, double eps, double *R)
{
    int i, j, k;
    for (i = 0; i < n * n; i++) R[i] = 0.0;
    for (i = 0; i < n; i++) {
        for (j = i; j < n; j++) {
            double s = H[i * n + j] + (i == j ? eps : 0.0);
            for (k = 0; k < i; k++) s -= R[k * n + i] * R[k * n + j];
            if (i == j) {
                if (s <= 0.0) return 1;
                R[i * n + i] = sqrt(s);
            } else {
                R[i * n + j] = s / R[i * n + i];
            }
        }
    }
    return 0;
}

/* Rinv = R^{-1} for upper R (row-major): back substitution per column */
static void inv_upper(int n, const double *R, double *Rinv)
{
    int i, j, k;
    for (i = 0; i < n * n; i++) Rinv[i] = 0.0;
    for (j = 0; j < n; j++) {
        Rinv[j * n + j] = 1.0 / R[j * n + j];
        for (i = j - 1; i >= 0; i--) {
            double s = 0.0;
            for (k = i + 1; k <= j; k++)
                s += R[i * n + k] * Rinv[k * n + j];
            Rinv[i * n + j] = -s / R[i * n + i];
        }
    }
}

static int grow_capacity(DAQPTpuWork *w, int K_new);

/* Cholesky factorization of H into w->Rinv with the retry-doubling
 * shift (utils.c:253-283); H == NULL -> identity (LP mode).  Returns 0
 * or DAQP_TPU_NONCONVEX. */
static int factorize_H(DAQPTpuWork *w, const double *H)
{
    int i, n = w->n, err = 0;
    double *R = (double *)malloc(sizeof(double) * (size_t)n * n);
    if (!R) return DAQP_TPU_NONCONVEX;
    if (H) {
        double hscale = 0.0, eps;
        for (i = 0; i < n; i++)
            if (fabs(H[i * n + i]) > hscale) hscale = fabs(H[i * n + i]);
        if (chol_upper(n, H, 0.0, R)) {
            int ok = 0, t;
            eps = sqrt(w->ztol) * (hscale > 0 ? hscale : 1.0);
            if (eps < 1e-6) eps = 1e-6;     /* eps_prox floor */
            for (t = 0; t < 16; t++) {
                if (!chol_upper(n, H, eps, R)) { ok = 1; break; }
                eps *= 2.0;
            }
            if (!ok) err = DAQP_TPU_NONCONVEX;
        }
    } else {
        /* LP mode: R = I (the proximal regularization IS the Hessian;
         * api.c:175-177 + daqp_prox.c LP regime) */
        for (i = 0; i < n * n; i++) R[i] = 0.0;
        for (i = 0; i < n; i++) R[i * n + i] = 1.0;
    }
    if (!err) inv_upper(n, R, w->Rinv);
    free(R);
    return err;
}

/* v = Rinv' f_user (daqp_update_v, utils.c:385-408) */
static void compute_v_w(DAQPTpuWork *w)
{
    int i, j, n = w->n;
    for (i = 0; i < n; i++) {
        double s = 0.0;
        for (j = 0; j < n; j++) s += w->Rinv[j * n + i] * w->f_user[j];
        w->v[i] = s;
    }
}

/* M = [Rinv[:ms]; A_user Rinv], UNNORMALIZED (daqp_update_M,
 * utils.c:345-383) */
static void build_M_w(DAQPTpuWork *w)
{
    int i, j, k, n = w->n, m = w->m, ms = w->ms;
    for (i = 0; i < ms; i++)
        for (j = 0; j < n; j++) w->M[i * n + j] = w->Rinv[i * n + j];
    for (i = ms; i < m; i++)
        for (j = 0; j < n; j++) {
            double s = 0.0;
            for (k = 0; k < n; k++)
                s += w->A_user[(i - ms) * n + k] * w->Rinv[k * n + j];
            w->M[i * n + j] = s;
        }
}

/* Row derivation pipeline from the raw user data: equality
 * auto-detection + trivial-infeasibility (daqp_check_bounds,
 * utils.c:457-478), row normalization with zero-row handling
 * (utils.c:480-524), binary ids, soft-capacity growth.  With
 * ``fresh_M`` the rows are normalized in place and scaling recomputed;
 * otherwise (sense/bounds-only update) the existing normalized M and
 * scaling persist and zero rows are recognized by ~0 normalized norm. */
static int derive_rows_w(DAQPTpuWork *w, int fresh_M)
{
    int i, j, nb = 0, ns = 0, err = 0;
    int n = w->n, m = w->m;
    for (i = 0; i < m; i++) {
        int sb = w->sense_user[i];
        double nrm2 = 0.0, diff;
        if (sb & DAQP_TPU_BINARY) w->bin_ids[nb++] = i;
        if (sb & DAQP_TPU_SOFT) ns++;
        /* equality auto-detection (daqp_check_bounds, utils.c:457-478) */
        diff = w->bu_user[i] - w->bl_user[i];
        if (!(sb & DAQP_TPU_IMMUTABLE)) {
            if (diff < -w->ptol) err = DAQP_TPU_INFEASIBLE;
            if (diff < w->ztol && !(sb & DAQP_TPU_SOFT))
                sb |= DAQP_TPU_ACTIVE | DAQP_TPU_IMMUTABLE;
        }
        /* row normalization (utils.c:480-524) */
        for (j = 0; j < n; j++) nrm2 += w->M[i * n + j] * w->M[i * n + j];
        if (nrm2 < w->ztol) {
            if (!(sb & (DAQP_TPU_IMMUTABLE | DAQP_TPU_SOFT))
                && (w->bu_user[i] < -w->ztol || w->bl_user[i] > w->ztol))
                err = DAQP_TPU_INFEASIBLE;
            w->scaling[i] = 1.0;
            for (j = 0; j < n; j++) w->M[i * n + j] = 0.0;
            sb = (sb | DAQP_TPU_IMMUTABLE) & ~DAQP_TPU_ACTIVE;
        } else if (fresh_M) {
            double sc = 1.0 / sqrt(nrm2);
            w->scaling[i] = sc;
            for (j = 0; j < n; j++) w->M[i * n + j] *= sc;
        }
        w->sense0[i] = sb;
        w->sense[i] = sb;
    }
    w->nb = nb;
    if (n + ns + 1 > w->K && grow_capacity(w, n + ns + 1))
        err = DAQP_TPU_NONCONVEX;       /* allocation failure */
    return err;
}

/* d = b*scaling + M v (daqp_update_d, utils.c:410-455); also refreshes
 * the pristine du0/dl0 the hierarchical walk restores from */
static void compute_d_w(DAQPTpuWork *w)
{
    int i, j, n = w->n, m = w->m;
    for (i = 0; i < m; i++) {
        double mv = 0.0;
        for (j = 0; j < n; j++) mv += w->M[i * n + j] * w->v[j];
        w->du[i] = w->bu_user[i] * w->scaling[i] + mv;
        w->dl[i] = w->bl_user[i] * w->scaling[i] + mv;
        w->du0[i] = w->du[i]; w->dl0[i] = w->dl[i];
    }
}

DAQPTpuWork *daqp_tpu_setup(int n, int m, int ms,
                            const double *H, const double *f,
                            const double *A, const double *bupper,
                            const double *blower, const int *sense)
{
    int i, ns = 0, nb = 0, K;
    DAQPTpuWork *w = (DAQPTpuWork *)calloc(1, sizeof(DAQPTpuWork));
    if (!w) return NULL;
    w->n = n; w->m = m; w->ms = ms;
    w->ptol = 1e-6; w->dtol = 1e-12; w->ztol = 1e-11; w->pivtol = 1e-6;
    w->progtol = 1e-14; w->singtol = 3.7e-11; w->rftol = 1e-9;
    w->rho_soft = 1e-6; w->fval_bound = DINF;
    w->rel_subopt = 0.0; w->abs_subopt = 0.0;
    w->eps_prox = 1e-6; w->eta_prox = -1.0;
    w->time_limit = 0.0; w->deadline = DINF;
    w->cyc_tol = 10; w->iter_limit = 10000;
    w->lp_mode = (H == NULL);
    w->lp_eps = 1.0;
    for (i = 0; i < m; i++) {
        if (sense && (sense[i] & DAQP_TPU_SOFT)) ns++;
        if (sense && (sense[i] & DAQP_TPU_BINARY)) nb++;
    }
    K = n + ns + 1;
    w->K = K; w->nb = nb;
    w->M = (double *)malloc(sizeof(double) * m * n);
    w->Rinv = (double *)calloc((size_t)n * n, sizeof(double));
    w->scaling = (double *)malloc(sizeof(double) * m);
    w->du = (double *)malloc(sizeof(double) * m);
    w->dl = (double *)malloc(sizeof(double) * m);
    w->du0 = (double *)malloc(sizeof(double) * m);
    w->dl0 = (double *)malloc(sizeof(double) * m);
    w->v = (double *)calloc(n, sizeof(double));
    w->sense = (int *)calloc(m, sizeof(int));
    w->sense0 = (int *)calloc(m, sizeof(int));
    w->bin_ids = (int *)malloc(sizeof(int) * (m ? m : 1));
    w->f_user = (double *)calloc(n, sizeof(double));
    w->bu_user = (double *)malloc(sizeof(double) * m);
    w->bl_user = (double *)malloc(sizeof(double) * m);
    w->A_user = (double *)malloc(sizeof(double)
                                 * (size_t)(m - ms > 0 ? m - ms : 1) * n);
    w->sense_user = (int *)calloc(m, sizeof(int));
    w->x_lp = (double *)calloc(n, sizeof(double));
    w->E = (double *)calloc((size_t)K * K, sizeof(double));
    w->Mw = (double *)malloc(sizeof(double) * K * n);
    w->lam = (double *)calloc(K, sizeof(double));
    w->lam_star = (double *)calloc(K, sizeof(double));
    w->WS = (int *)calloc(K, sizeof(int));
    w->u = (double *)calloc(n, sizeof(double));
    w->sdir = (double *)calloc(K, sizeof(double));
    w->scr1 = (double *)calloc(K, sizeof(double));
    w->scr2 = (double *)calloc(K, sizeof(double));
    w->iscr = (int *)calloc(K, sizeof(int));
    if (!w->M || !w->Rinv || !w->scaling || !w->du || !w->dl || !w->du0
        || !w->dl0 || !w->v || !w->sense || !w->sense0 || !w->bin_ids
        || !w->E || !w->Mw || !w->lam || !w->lam_star || !w->WS || !w->u
        || !w->sdir || !w->scr1 || !w->scr2 || !w->iscr
        || !w->f_user || !w->bu_user || !w->bl_user || !w->x_lp
        || !w->A_user || !w->sense_user) {
        daqp_tpu_free(w); return NULL;
    }
    if (f) memcpy(w->f_user, f, sizeof(double) * n);
    memcpy(w->bu_user, bupper, sizeof(double) * m);
    memcpy(w->bl_user, blower, sizeof(double) * m);
    if (m > ms) memcpy(w->A_user, A, sizeof(double) * (size_t)(m - ms) * n);
    if (sense) memcpy(w->sense_user, sense, sizeof(int) * m);

    w->err0 = factorize_H(w, H);
    if (f && !w->err0) compute_v_w(w);
    build_M_w(w);
    if (!w->err0) {
        int err = derive_rows_w(w, 1);
        if (err) w->err0 = err;
    } else {
        derive_rows_w(w, 1);            /* still derive sense/bin ids */
    }
    compute_d_w(w);
    w->m_price = m;
    return w;
}

DAQPTpuWork *daqp_tpu_setup_avi(int n, int m, int ms,
                                const double *H, const double *f,
                                const double *A, const double *bupper,
                                const double *blower, const int *sense)
{
    /* AVI setup (daqp_update_avi, utils.c:600-638): the inner projection
     * LDP lives in the Hs_rho = sym(H) + rho*I metric (PD by
     * construction), so the common QP setup does the transform; the
     * original asymmetric H, its LU, and LU(H + rho I) are kept for the
     * DR outer update and the exact KKT acceleration. */
    int i, j, K;
    double min_diag = DINF, max_row_sum = 0.0, fro2 = 0.0, rho;
    double *Hsym, *Hs_rho;
    DAQPTpuWork *w;
    Hsym = (double *)malloc(sizeof(double) * (size_t)n * n);
    Hs_rho = (double *)malloc(sizeof(double) * (size_t)n * n);
    if (!Hsym || !Hs_rho) { free(Hsym); free(Hs_rho); return NULL; }
    for (i = 0; i < n; i++) {
        double row_sum = 0.0;
        for (j = 0; j < n; j++) {
            double val = 0.5 * (H[i * n + j] + H[j * n + i]);
            Hsym[i * n + j] = val;
            row_sum += fabs(val);
            fro2 += H[i * n + j] * H[i * n + j];
            if (i == j && val < min_diag) min_diag = val;
        }
        if (row_sum > max_row_sum) max_row_sum = row_sum;
    }
    rho = (min_diag > 0.0 && max_row_sum > 0.0)
        ? sqrt(min_diag * max_row_sum) : sqrt(fro2) / 2.0;
    memcpy(Hs_rho, Hsym, sizeof(double) * (size_t)n * n);
    for (i = 0; i < n; i++) Hs_rho[i * n + i] += rho;

    w = daqp_tpu_setup(n, m, ms, Hs_rho, NULL, A, bupper, blower, sense);
    free(Hs_rho);
    if (!w) { free(Hsym); return NULL; }
    /* raw f for the outer loop / KKT (setup ran with f = NULL) */
    if (f) memcpy(w->f_user, f, sizeof(double) * n);
    K = w->K;
    w->avi_mode = 1;
    w->avi_rho = rho;
    w->avi_Hsym = Hsym;
    w->avi_H = (double *)malloc(sizeof(double) * (size_t)n * n);
    w->avi_A = (double *)malloc(sizeof(double)
                                * (size_t)(m - ms > 0 ? m - ms : 1) * n);
    w->avi_LUH = (double *)malloc(sizeof(double) * (size_t)n * n);
    w->avi_LUHr = (double *)malloc(sizeof(double) * (size_t)n * n);
    w->avi_piv = (int *)malloc(sizeof(int) * n);
    w->avi_pivr = (int *)malloc(sizeof(int) * n);
    w->avi_x = (double *)calloc(n, sizeof(double));
    w->avi_y = (double *)calloc(n, sizeof(double));
    w->avi_yold = (double *)calloc(n, sizeof(double));
    w->avi_xt = (double *)calloc(n, sizeof(double));
    w->avi_t1 = (double *)calloc(n, sizeof(double));
    w->avi_t2 = (double *)calloc(n, sizeof(double));
    w->avi_kkt = (double *)malloc(sizeof(double) * ((size_t)K * K + K));
    w->avi_kpiv = (int *)malloc(sizeof(int) * K);
    if (!w->avi_H || !w->avi_A || !w->avi_LUH || !w->avi_LUHr
        || !w->avi_piv || !w->avi_pivr || !w->avi_x || !w->avi_y
        || !w->avi_yold || !w->avi_xt || !w->avi_t1 || !w->avi_t2
        || !w->avi_kkt || !w->avi_kpiv) {
        daqp_tpu_free(w);
        return NULL;
    }
    memcpy(w->avi_H, H, sizeof(double) * (size_t)n * n);
    if (m > ms)
        memcpy(w->avi_A, A, sizeof(double) * (size_t)(m - ms) * n);
    memcpy(w->avi_LUH, H, sizeof(double) * (size_t)n * n);
    if (lu_fact(n, w->avi_LUH, w->avi_piv))
        w->err0 = DAQP_TPU_NONCONVEX;   /* singular H: no KKT/DR inverse */
    memcpy(w->avi_LUHr, H, sizeof(double) * (size_t)n * n);
    for (i = 0; i < n; i++) w->avi_LUHr[i * n + i] += rho;
    if (lu_fact(n, w->avi_LUHr, w->avi_pivr))
        w->err0 = DAQP_TPU_NONCONVEX;
    return w;
}

void daqp_tpu_update(DAQPTpuWork *w, const double *f,
                     const double *bupper, const double *blower)
{
    int i, j;
    int n = w->n, m = w->m;
    if (f) memcpy(w->f_user, f, sizeof(double) * n);
    if (bupper) memcpy(w->bu_user, bupper, sizeof(double) * m);
    if (blower) memcpy(w->bl_user, blower, sizeof(double) * m);
    if (f)
        for (i = 0; i < n; i++) {
            double s = 0.0;
            for (j = 0; j < n; j++) s += w->Rinv[j * n + i] * f[j];
            w->v[i] = s;
        }
    for (i = 0; i < m; i++) {
        double mv = 0.0;
        for (j = 0; j < n; j++) mv += w->M[i * n + j] * w->v[j];
        if (bupper) w->du[i] = bupper[i] * w->scaling[i] + mv;
        if (blower) w->dl[i] = blower[i] * w->scaling[i] + mv;
    }
}

int daqp_tpu_set(DAQPTpuWork *w, const char *name, double value)
{
    if (!strcmp(name, "primal_tol")) w->ptol = value;
    else if (!strcmp(name, "dual_tol")) w->dtol = value;
    else if (!strcmp(name, "zero_tol")) w->ztol = value;
    else if (!strcmp(name, "pivot_tol")) w->pivtol = value;
    else if (!strcmp(name, "progress_tol")) w->progtol = value;
    else if (!strcmp(name, "sing_tol")) w->singtol = value;
    else if (!strcmp(name, "refactor_tol")) w->rftol = value;
    else if (!strcmp(name, "rho_soft")) w->rho_soft = value;
    else if (!strcmp(name, "fval_bound")) w->fval_bound = value;
    else if (!strcmp(name, "rel_subopt")) w->rel_subopt = value;
    else if (!strcmp(name, "abs_subopt")) w->abs_subopt = value;
    else if (!strcmp(name, "cycle_tol")) w->cyc_tol = (int)value;
    else if (!strcmp(name, "iter_limit")) w->iter_limit = (int)value;
    else if (!strcmp(name, "eps_prox")) w->eps_prox = value;
    else if (!strcmp(name, "eta_prox")) w->eta_prox = value;
    else if (!strcmp(name, "time_limit")) w->time_limit = value;
    else return -1;
    return 0;
}

void daqp_tpu_free(DAQPTpuWork *w)
{
    if (!w) return;
    free(w->M); free(w->Rinv); free(w->scaling);
    free(w->du); free(w->dl); free(w->du0); free(w->dl0);
    free(w->f_user); free(w->bu_user); free(w->bl_user); free(w->x_lp);
    free(w->A_user); free(w->sense_user);
    free(w->v); free(w->sense); free(w->sense0); free(w->bin_ids);
    free(w->E); free(w->Mw); free(w->lam); free(w->lam_star);
    free(w->WS); free(w->u); free(w->sdir);
    free(w->scr1); free(w->scr2); free(w->iscr);
    free(w->avi_H); free(w->avi_Hsym); free(w->avi_A);
    free(w->avi_LUH); free(w->avi_LUHr);
    free(w->avi_piv); free(w->avi_pivr);
    free(w->avi_x); free(w->avi_y); free(w->avi_yold); free(w->avi_xt);
    free(w->avi_t1); free(w->avi_t2); free(w->avi_kkt); free(w->avi_kpiv);
    free(w);
}

/* ---------- core loop (daqp.c / auxiliary.c / factorization.c) --------- */

static void reset_ws(DAQPTpuWork *w)
{
    int i;
    w->n_active = 0; w->ns_active = 0; w->sing_flag = 0;
    memset(w->E, 0, sizeof(double) * (size_t)w->K * w->K);
    for (i = 0; i < w->m; i++) w->sense[i] &= ~DAQP_TPU_ACTIVE;
}

void daqp_tpu_reset(DAQPTpuWork *w) { reset_ws(w); }

/* bordered-inverse addition (factorization.c:7-98 role; explicit-inverse
 * realization).  k >= K-1 is the defensive full-table backstop. */
static int add_constraint(DAQPTpuWork *w, int id, double lam0)
{
    int i, j, k = w->n_active, n = w->n, K = w->K;
    int is_soft = (w->sense[id] & DAQP_TPU_SOFT) != 0;
    const double *mi = &w->M[id * n];
    double dii = 0.0, sval;
    double *g = w->scr1, *a = w->scr2;
    for (i = 0; i < n; i++) dii += mi[i] * mi[i];
    if (is_soft) dii += w->rho_soft;
    for (i = 0; i < k; i++) {
        double s = 0.0;
        for (j = 0; j < n; j++) s += w->Mw[i * n + j] * mi[j];
        g[i] = s;
    }
    for (i = 0; i < k; i++) {
        double s = 0.0;
        for (j = 0; j < k; j++) s += w->E[i * K + j] * g[j];
        a[i] = s;
    }
    sval = dii;
    for (i = 0; i < k; i++) sval -= g[i] * a[i];

    w->WS[k] = id; w->lam[k] = lam0;
    for (i = 0; i < n; i++) w->Mw[k * n + i] = mi[i];
    w->sense[id] |= DAQP_TPU_ACTIVE;
    w->n_active = k + 1;
    w->ns_active += is_soft;
    if (sval < w->singtol || k >= n + w->ns_active || k >= K - 1) {
        for (i = 0; i < k; i++) w->sdir[i] = -a[i];
        w->sdir[k] = 1.0;
        if (w->sense[id] & DAQP_TPU_LOWER)
            for (i = 0; i <= k; i++) w->sdir[i] = -w->sdir[i];
        w->sing_flag = 1;
        return 1;
    }
    for (i = 0; i < k; i++) {
        for (j = 0; j < k; j++)
            w->E[i * K + j] += a[i] * a[j] / sval;
        w->E[i * K + k] = -a[i] / sval;
        w->E[k * K + i] = -a[i] / sval;
    }
    w->E[k * K + k] = 1.0 / sval;
    w->sing_flag = 0;
    return 0;
}

static void remove_constraint(DAQPTpuWork *w, int pos)
{
    int i, j, k = w->n_active, n = w->n, K = w->K;
    int was_sing = w->sing_flag;
    int k_ns = k - (was_sing ? 1 : 0);
    w->ns_active -= (w->sense[w->WS[pos]] & DAQP_TPU_SOFT) != 0;
    w->sense[w->WS[pos]] &= ~DAQP_TPU_ACTIVE;
    if (pos < k_ns) {                 /* deletion-inverse update */
        double err = w->E[pos * K + pos];
        double *e_ = w->scr1;
        for (i = 0; i < k_ns; i++) e_[i] = w->E[i * K + pos];
        for (i = 0; i < k_ns; i++)
            for (j = 0; j < k_ns; j++)
                w->E[i * K + j] -= e_[i] * e_[j] / err;
        for (i = pos; i < k_ns - 1; i++)
            for (j = 0; j < k_ns; j++)
                w->E[i * K + j] = w->E[(i + 1) * K + j];
        for (j = pos; j < k_ns - 1; j++)
            for (i = 0; i < k_ns; i++)
                w->E[i * K + j] = w->E[i * K + (j + 1)];
    }
    for (i = pos; i < k - 1; i++) {
        w->WS[i] = w->WS[i + 1]; w->lam[i] = w->lam[i + 1];
        for (j = 0; j < n; j++)
            w->Mw[i * n + j] = w->Mw[(i + 1) * n + j];
    }
    w->n_active = k - 1;
    w->sing_flag = 0;
    if (was_sing && pos < k - 1) {    /* re-add the parked entry */
        int last = w->n_active - 1;
        int id2 = w->WS[last];
        double l2 = w->lam[last];
        w->n_active = last;
        w->ns_active -= (w->sense[id2] & DAQP_TPU_SOFT) != 0;
        w->sense[id2] &= ~DAQP_TPU_ACTIVE;
        add_constraint(w, id2, l2);
    }
}

static void refactor_ws(DAQPTpuWork *w)
{
    int i, k = w->n_active;
    int *ids = w->iscr; double *lams = w->scr2;
    for (i = 0; i < k; i++) { ids[i] = w->WS[i]; lams[i] = w->lam[i]; }
    w->n_active = 0; w->ns_active = 0; w->sing_flag = 0;
    memset(w->E, 0, sizeof(double) * (size_t)w->K * w->K);
    for (i = 0; i < k; i++) w->sense[ids[i]] &= ~DAQP_TPU_ACTIVE;
    for (i = 0; i < k && !w->sing_flag; i++)
        add_constraint(w, ids[i], lams[i]);
}

static void fix_senses_from_lam(DAQPTpuWork *w)
{
    int i;
    for (i = 0; i < w->n_active; i++) {
        if (w->sense[w->WS[i]] & DAQP_TPU_IMMUTABLE) continue;
        if (w->lam[i] < 0) w->sense[w->WS[i]] |= DAQP_TPU_LOWER;
        else w->sense[w->WS[i]] &= ~DAQP_TPU_LOWER;
    }
}

static void refine_active(DAQPTpuWork *w)
{
    int i, j, l, k = w->n_active, n = w->n, K = w->K;
    double *r = w->scr1;
    for (i = 0; i < k; i++) {
        double acc = (w->sense[w->WS[i]] & DAQP_TPU_LOWER)
            ? w->dl[w->WS[i]] : w->du[w->WS[i]];
        for (j = 0; j < k; j++) {
            double g = 0.0;
            for (l = 0; l < n; l++)
                g += w->Mw[i * n + l] * w->Mw[j * n + l];
            if (i == j && (w->sense[w->WS[i]] & DAQP_TPU_SOFT))
                g += w->rho_soft;
            acc += g * w->lam_star[j];
        }
        r[i] = -acc;
    }
    for (i = 0; i < k; i++) {
        double corr = 0.0;
        for (j = 0; j < k; j++) corr += w->E[i * K + j] * r[j];
        w->sdir[i] = corr;
    }
    for (i = 0; i < k; i++) w->lam_star[i] += w->sdir[i];
}

static void compute_u(DAQPTpuWork *w)
{
    int i, j, k = w->n_active, n = w->n;
    for (j = 0; j < n; j++) w->u[j] = 0.0;
    for (i = 0; i < k; i++)
        for (j = 0; j < n; j++)
            w->u[j] -= w->Mw[i * n + j] * w->lam_star[i];
    w->last_ss = 0.0;
    for (i = 0; i < k; i++)
        if (w->sense[w->WS[i]] & DAQP_TPU_SOFT)
            w->last_ss += w->lam_star[i] * w->lam_star[i];
    w->last_ss *= w->rho_soft;
    w->last_fv = w->last_ss;
    for (j = 0; j < n; j++) w->last_fv += w->u[j] * w->u[j];
}

static int in_ws(DAQPTpuWork *w, int id)
{
    int i;
    for (i = 0; i < w->n_active; i++) if (w->WS[i] == id) return 1;
    return 0;
}

/* Dantzig pricing (daqp_add_infeasible, auxiliary.c:88-166) */
static int price_worst(DAQPTpuWork *w, int *blower)
{
    int i, j, jbest = -1, n = w->n;
    double worst = 0.0;
    for (i = 0; i < w->m_price; i++) {
        double mu = 0.0, vu, vl;
        if (w->sense[i] & (DAQP_TPU_ACTIVE | DAQP_TPU_IMMUTABLE)) continue;
        for (j = 0; j < n; j++) mu += w->M[i * n + j] * w->u[j];
        vu = w->du[i] - mu;
        vl = mu - w->dl[i];
        if (vu < -w->ptol * w->scaling[i] && vu < worst) {
            worst = vu; jbest = i; *blower = 0;
        } else if (vl < -w->ptol * w->scaling[i] && vl < worst) {
            worst = vl; jbest = i; *blower = 1;
        }
    }
    return jbest;
}

/* warm/equality activation (daqp_activate_constraints,
 * auxiliary.c:398-478) with redundant-equality consistency */
static int activate_warm(DAQPTpuWork *w, int start, int end)
{
    int i, j;
    for (i = start; i < end; i++) {
        if (!(w->sense[i] & DAQP_TPU_ACTIVE) || in_ws(w, i)) continue;
        w->sense[i] &= ~DAQP_TPU_ACTIVE;
        add_constraint(w, i, (w->sense[i] & DAQP_TPU_LOWER) ? -1.0 : 1.0);
        if (w->sing_flag) {
            if (w->sense[i] & DAQP_TPU_IMMUTABLE) {
                double viol = 0.0;
                for (j = 0; j < w->n_active; j++) {
                    int id2 = w->WS[j];
                    viol += w->sdir[j] * ((w->sense[id2] & DAQP_TPU_LOWER)
                            ? w->dl[id2] : w->du[id2]);
                }
                if (fabs(viol) > w->ptol) return DAQP_TPU_OVERDETERMINED;
            }
            w->n_active--; w->sing_flag = 0;
            w->ns_active -= (w->sense[i] & DAQP_TPU_SOFT) != 0;
            w->sense[i] &= ~DAQP_TPU_ACTIVE;
        }
    }
    return 0;
}

/* main loop (daqp_ldp, daqp.c:6-108) incl. dominance cut, cycling guard
 * with one-shot repair, ill-conditioning refactor, refinement + re-price */
static int solve_inner(DAQPTpuWork *w, int *iters, double fbound)
{
    int it, i, j, K = w->K;
    double best_fv = -DINF;
    int cycle_ct = 0, tried_repair = 0;
    for (it = 0; it < w->iter_limit; it++) {
        int k = w->n_active, rm = -1;
        double amin = DINF;
        /* wall-clock check every 32 iterations (daqp.c:95-103) */
        if (w->time_limit > 0.0 && (it & 31) == 31
            && now_sec() > w->deadline) {
            *iters = it + 1;
            return DAQP_TPU_TIMELIMIT;
        }
        if (!w->sing_flag) {          /* CSP: lam* = -E d_W */
            for (i = 0; i < k; i++) {
                double d = (w->sense[w->WS[i]] & DAQP_TPU_LOWER)
                    ? w->dl[w->WS[i]] : w->du[w->WS[i]];
                w->lam_star[i] = d;
            }
            for (i = 0; i < k; i++) {
                double s = 0.0;
                for (j = 0; j < k; j++)
                    s += w->E[i * K + j] * w->lam_star[j];
                w->sdir[i] = -s;
            }
            for (i = 0; i < k; i++) w->lam_star[i] = w->sdir[i];
        }
        for (i = 0; i < k; i++) {     /* blocking min-ratio */
            double dir = w->sing_flag ? w->sdir[i] : w->lam_star[i];
            double del = w->sing_flag ? w->sdir[i]
                                      : w->lam_star[i] - w->lam[i];
            int lower = w->sense[w->WS[i]] & DAQP_TPU_LOWER;
            if (w->sense[w->WS[i]] & DAQP_TPU_IMMUTABLE) continue;
            if ((lower && dir > w->dtol) || (!lower && dir < -w->dtol)) {
                /* an eligible (dual-infeasible) entry must always be a
                 * candidate; del ~ 0 / negative ratios clamp to a
                 * zero-step removal (auxiliary.c:283-287 exit gate) */
                double r = (del != 0.0) ? -w->lam[i] / del : 0.0;
                if (r < 0.0) r = 0.0;
                if (r < amin) { amin = r; rm = i; }
            }
        }
        if (rm >= 0) {
            for (i = 0; i < k; i++)
                w->lam[i] += amin * (w->sing_flag ? w->sdir[i]
                                     : w->lam_star[i] - w->lam[i]);
            remove_constraint(w, rm);
            continue;
        }
        if (w->sing_flag) { *iters = it + 1; return DAQP_TPU_INFEASIBLE; }

        compute_u(w);
        if (w->last_fv > fbound) {    /* dominance cut, daqp.c:20-23 */
            *iters = it + 1; return DAQP_TPU_INFEASIBLE;
        }
        if (w->last_fv - best_fv < w->progtol * (1.0 + fabs(w->last_fv))) {
            if (++cycle_ct > w->cyc_tol) {
                if (tried_repair) { *iters = it + 1; return DAQP_TPU_CYCLE; }
                tried_repair = 1; cycle_ct = 0;
                fix_senses_from_lam(w);
                refactor_ws(w);
                continue;
            }
        } else { cycle_ct = 0; best_fv = w->last_fv; }

        {
            int blower = 0, jbest = price_worst(w, &blower);
            if (jbest < 0) {
                double max_diag = 0.0;
                for (i = 0; i < k; i++)
                    if (w->E[i * K + i] > max_diag)
                        max_diag = w->E[i * K + i];
                if (k > 0 && max_diag * w->rftol > 1.0 && !tried_repair) {
                    tried_repair = 1;
                    fix_senses_from_lam(w);
                    refactor_ws(w);
                    continue;
                }
                if (k > 0 && max_diag * w->pivtol > 1.0) {
                    refine_active(w);
                    compute_u(w);
                    jbest = price_worst(w, &blower);   /* daqp.c:52-56 */
                }
                if (jbest < 0) {
                    for (i = 0; i < k; i++) w->lam[i] = w->lam_star[i];
                    *iters = it + 1;
                    return w->last_ss > w->ptol ? DAQP_TPU_SOFT_OPTIMAL
                                                : DAQP_TPU_OPTIMAL;
                }
            }
            for (i = 0; i < k; i++) w->lam[i] = w->lam_star[i];
            if (blower) w->sense[jbest] |= DAQP_TPU_LOWER;
            else w->sense[jbest] &= ~DAQP_TPU_LOWER;
            add_constraint(w, jbest, blower ? -1.0 : 1.0);
        }
    }
    *iters = w->iter_limit;
    return DAQP_TPU_ITERLIMIT;
}

/* x = Rinv(u - v); QP fval = 0.5(fldp - ||v||^2); duals rescaled */
static void extract_sol(DAQPTpuWork *w, double *x, double *lam_out,
                        double *fval)
{
    int i, j, n = w->n;
    double fv = w->last_fv;
    for (j = 0; j < n; j++) {
        double s = 0.0;
        for (i = 0; i < n; i++)
            s += w->Rinv[j * n + i] * (w->u[i] - w->v[i]);
        x[j] = s;
        fv -= w->v[j] * w->v[j];
    }
    if (fval) *fval = 0.5 * fv;
    if (lam_out) {
        for (i = 0; i < w->m; i++) lam_out[i] = 0.0;
        for (i = 0; i < w->n_active; i++)
            lam_out[w->WS[i]] = w->lam_star[i] * w->scaling[w->WS[i]];
    }
}

/* gradient_step (daqp_prox.c:201-271): ray xnew + alpha (xnew - xold) to
 * the first blocking ORIGINAL-row bound, which is activated.  Returns 0
 * when no constraint blocks (unbounded ray). */
static int lp_gradient_step(DAQPTpuWork *w, double *xnew,
                            const double *xold)
{
    int i, j, jbest = -1, is_lower = 0, n = w->n;
    double best = DINF;
    for (i = 0; i < w->m; i++) {
        double ax = 0.0, ds = 0.0, a;
        if (w->sense[i] & (DAQP_TPU_ACTIVE | DAQP_TPU_IMMUTABLE)) continue;
        for (j = 0; j < n; j++) {
            ax += w->M[i * n + j] * xnew[j];
            ds += w->M[i * n + j] * (xnew[j] - xold[j]);
        }
        ax /= w->scaling[i];
        ds /= w->scaling[i];
        if (ds > 0.0 && w->bu_user[i] < DINF) {
            a = (w->bu_user[i] - ax) / ds;
            if (a < best) { best = a; jbest = i; is_lower = 0; }
        } else if (ds < 0.0 && w->bl_user[i] > -DINF) {
            a = (w->bl_user[i] - ax) / ds;
            if (a < best) { best = a; jbest = i; is_lower = 1; }
        }
    }
    if (jbest < 0) return 0;
    for (j = 0; j < n; j++) {
        double d = xnew[j] - xold[j];
        xnew[j] += best * d;
    }
    if (is_lower) w->sense[jbest] |= DAQP_TPU_LOWER;
    else w->sense[jbest] &= ~DAQP_TPU_LOWER;
    add_constraint(w, jbest, is_lower ? -1.0 : 1.0);
    return 1;
}

/* LP via adaptive proximal smoothing (daqp_prox.c:21-271 LP regime,
 * selected by n_prox = n at api.c:175-177): outer loop re-forms
 * v = f*eps - x, re-solves the warm LDP, fixed-point gate eta*eps,
 * gradient-step ray jumps off non-vertex stalls, duals rescaled by eps
 * at exit (daqp_prox.c:171-173).  eps grows x10 only on INTERIOR
 * stalls and shrinks x0.9 otherwise (cap 1e3) — at a stalled vertex
 * exact arithmetic already gives diff = 0 (see daqp_tpu/prox.py). */
static int solve_lp(DAQPTpuWork *w, double *x_out, double *lam_out,
                    double *fval, int *iters)
{
    int i, j, n = w->n, m = w->m;
    int total = 0, outer = 0, flag = DAQP_TPU_ITERLIMIT;
    double eps = 1.0;
    double eta = (w->eta_prox < 0.0)
        ? ((w->dtol != 1e-12 && 0.1 * w->dtol < 1e-6) ? 0.1 * w->dtol
                                                      : 1e-6)
        : w->eta_prox;
    double *x = w->x_lp;
    double *xnew = (double *)malloc(sizeof(double) * n);
    if (!xnew) return DAQP_TPU_NONCONVEX;
    memset(x, 0, sizeof(double) * n);
    while (total < w->iter_limit) {
        int it2 = 0, fl, stalled, at_vertex;
        double diff = 0.0;
        for (i = 0; i < n; i++) w->v[i] = w->f_user[i] * eps - x[i];
        for (i = 0; i < m; i++) {
            double mv = 0.0;
            for (j = 0; j < n; j++) mv += w->M[i * n + j] * w->v[j];
            w->du[i] = w->bu_user[i] * w->scaling[i] + mv;
            w->dl[i] = w->bl_user[i] * w->scaling[i] + mv;
        }
        fl = solve_inner(w, &it2, DINF);   /* warm: WS + E persist */
        total += it2;
        if (fl < 0) { flag = fl; break; }
        for (i = 0; i < n; i++) xnew[i] = w->u[i] - w->v[i];
        for (i = 0; i < n; i++) {
            double d = fabs(xnew[i] - x[i]);
            if (d > diff) diff = d;
        }
        stalled = (it2 == 1);
        at_vertex = (w->n_active == n);
        if (diff < eta * eps) {
            memcpy(x, xnew, sizeof(double) * n);
            flag = DAQP_TPU_OPTIMAL;
            break;
        }
        if (stalled && !at_vertex) {
            if (!lp_gradient_step(w, xnew, x)) {
                flag = DAQP_TPU_UNBOUNDED;
                break;
            }
        }
        if (outer > 0) {
            eps *= (stalled && !at_vertex) ? 10.0 : 0.9;
            if (eps > 1e3) eps = 1e3;
        }
        memcpy(x, xnew, sizeof(double) * n);
        outer++;
        if (w->time_limit > 0.0 && now_sec() > w->deadline) {
            flag = DAQP_TPU_TIMELIMIT;
            break;
        }
    }
    free(xnew);
    w->lp_eps = eps;
    if (iters) *iters = total;
    if (flag > 0) {
        if (x_out) memcpy(x_out, x, sizeof(double) * n);
        if (fval) {
            double s = 0.0;
            for (i = 0; i < n; i++) s += w->f_user[i] * x[i];
            *fval = s;                      /* LP fval (api.c:462-465) */
        }
        if (lam_out) {
            /* LDP duals of the eps-scaled objective: rescale by eps
             * (daqp_prox.c:171-173) on top of the row normalization */
            for (i = 0; i < m; i++) lam_out[i] = 0.0;
            for (i = 0; i < w->n_active; i++)
                lam_out[w->WS[i]] = w->lam_star[i]
                    * w->scaling[w->WS[i]] / eps;
        }
    }
    return flag;
}

/* exact KKT/Schur solve on the ORIGINAL asymmetric H for the current
 * working set (daqp_solve_avi_kkt, avi.c:103-184): S = A_W H^{-1} A_W',
 * rhs = -(b_W + A_W H^{-1} f), soft rows regularize diag(S); duals land
 * in lam_star (original constraint space, unscaled), x in avi_x.
 * Returns 0 ok, 1 singular Schur system (treated as not-yet-optimal). */
static int avi_kkt_solve(DAQPTpuWork *w)
{
    int i, j, l, n = w->n, nAS = w->n_active;
    double *S = w->avi_kkt, *rhs = w->avi_kkt + (size_t)nAS * nAS;
    double *Hinv_f = w->avi_t1, *temp = w->avi_t2, *e = w->avi_xt;
    if (nAS == 0) {
        for (i = 0; i < n; i++) e[i] = -w->f_user[i];
        lu_solve(n, w->avi_LUH, w->avi_piv, e, w->avi_x);
        return 0;
    }
    for (i = 0; i < nAS; i++) {
        int row = w->WS[i];
        const double *ar;
        if (row < w->ms) {              /* simple bound: unit row */
            for (j = 0; j < n; j++) e[j] = 0.0;
            e[row] = 1.0;
            ar = e;
        } else {
            ar = &w->avi_A[(size_t)(row - w->ms) * n];
        }
        lu_solve(n, w->avi_LUH, w->avi_piv, ar, temp);
        for (j = 0; j < nAS; j++) {
            int rj = w->WS[j];
            double s;
            if (rj < w->ms) {
                s = temp[rj];
            } else {
                s = 0.0;
                for (l = 0; l < n; l++)
                    s += w->avi_A[(size_t)(rj - w->ms) * n + l] * temp[l];
            }
            S[j * nAS + i] = s;
        }
    }
    lu_solve(n, w->avi_LUH, w->avi_piv, w->f_user, Hinv_f);
    for (i = 0; i < nAS; i++) {
        int row = w->WS[i];
        double s = (w->sense[row] & DAQP_TPU_LOWER)
            ? w->bl_user[row] : w->bu_user[row];
        if (row < w->ms) {
            s += Hinv_f[row];
        } else {
            for (l = 0; l < n; l++)
                s += w->avi_A[(size_t)(row - w->ms) * n + l] * Hinv_f[l];
        }
        rhs[i] = -s;
        if (w->sense[row] & DAQP_TPU_SOFT)
            S[i * (nAS + 1)] += w->rho_soft
                / (w->scaling[row] * w->scaling[row]);
    }
    if (lu_fact(nAS, S, w->avi_kpiv)) return 1;
    lu_solve(nAS, S, w->avi_kpiv, rhs, w->lam_star);
    /* x = H^{-1}(-f - A_W' lam) */
    for (i = 0; i < n; i++) temp[i] = -w->f_user[i];
    for (j = 0; j < nAS; j++) {
        int row = w->WS[j];
        double lj = w->lam_star[j];
        if (row < w->ms) {
            temp[row] -= lj;
        } else {
            for (l = 0; l < n; l++)
                temp[l] -= w->avi_A[(size_t)(row - w->ms) * n + l] * lj;
        }
    }
    lu_solve(n, w->avi_LUH, w->avi_piv, temp, w->avi_x);
    return 0;
}

/* KKT verification of the candidate (daqp_check_optimal_avi,
 * avi.c:187-221): dual signs on the working set, raw primal feasibility
 * of the inactive rows at avi_x. */
static int avi_check_optimal(DAQPTpuWork *w)
{
    int i, j, n = w->n;
    for (i = 0; i < w->n_active; i++) {
        int row = w->WS[i];
        if (w->sense[row] & DAQP_TPU_IMMUTABLE) continue;
        if (w->sense[row] & DAQP_TPU_LOWER) {
            if (w->lam_star[i] > w->dtol) return 0;
        } else if (w->lam_star[i] < -w->dtol) {
            return 0;
        }
    }
    for (i = 0; i < w->m; i++) {
        double ax;
        if (w->sense[i] & DAQP_TPU_ACTIVE) continue;
        if (i < w->ms) {
            ax = w->avi_x[i];
        } else {
            ax = 0.0;
            for (j = 0; j < n; j++)
                ax += w->avi_A[(size_t)(i - w->ms) * n + j] * w->avi_x[j];
        }
        if (ax > w->bu_user[i] + w->ptol) return 0;
        if (ax < w->bl_user[i] - w->ptol) return 0;
    }
    return 1;
}

/* AVI outer loop (daqp_solve_avi, avi.c:6-101): DR splitting over the
 * warm inner LDP in the Hs_rho metric; a terminate_limit-stable inner
 * active set triggers the exact KKT try; a Newton step that grows the
 * natural residual ||x - y_inner||^2 is reverted and the limit extended
 * (+5, cap 30).  avi_x persists across calls (warm outer iterate). */
static int solve_avi(DAQPTpuWork *w, double *x_out, double *lam_out,
                     double *fval, int *iters)
{
    int i, j, k, n = w->n, m = w->m;
    int tot = 0, counter = 0, terminate_limit = 5;
    int flag = DAQP_TPU_ITERLIMIT, unc_ok = 1;
    double min_res = DINF;
    double *x = w->avi_x, *y = w->avi_y, *xold = w->avi_yold;
    double *xtemp = w->avi_xt, *Hx = w->avi_t1, *yin = w->avi_t2;

    flag = activate_warm(w, 0, m);
    if (flag < 0) { if (iters) *iters = 0; return flag; }
    flag = DAQP_TPU_ITERLIMIT;

    /* unconstrained shortcut (utils.c:54-55, :547-551) */
    for (i = 0; i < m && unc_ok; i++)
        if (w->sense[i] & (DAQP_TPU_ACTIVE | DAQP_TPU_IMMUTABLE))
            unc_ok = 0;
    if (unc_ok) {
        for (i = 0; i < n; i++) xtemp[i] = -w->f_user[i];
        lu_solve(n, w->avi_LUH, w->avi_piv, xtemp, yin);
        for (i = 0; i < m && unc_ok; i++) {
            double ax;
            if (i < w->ms) {
                ax = yin[i];
            } else {
                ax = 0.0;
                for (j = 0; j < n; j++)
                    ax += w->avi_A[(size_t)(i - w->ms) * n + j] * yin[j];
            }
            if (ax > w->bu_user[i] + w->ptol
                || ax < w->bl_user[i] - w->ptol)
                unc_ok = 0;
        }
        if (unc_ok) {
            memcpy(x, yin, sizeof(double) * n);
            if (iters) *iters = 1;
            if (x_out) memcpy(x_out, x, sizeof(double) * n);
            if (lam_out) for (i = 0; i < m; i++) lam_out[i] = 0.0;
            if (fval) {
                double s = 0.0;
                for (i = 0; i < n; i++) s += w->f_user[i] * x[i];
                *fval = s;
            }
            return DAQP_TPU_OPTIMAL;
        }
    }

    for (k = 0; k < w->iter_limit; k++) {
        int it2 = 0, fl;
        /* Hx = H x;  xtemp = Hx + f - (Hsym + rho I) x  (avi.c:23-31) */
        for (i = 0; i < n; i++) {
            double s = 0.0, s2 = 0.0;
            for (j = 0; j < n; j++) {
                s += w->avi_H[i * n + j] * x[j];
                s2 += w->avi_Hsym[i * n + j] * x[j];
            }
            Hx[i] = s;
            xtemp[i] = s + w->f_user[i] - s2 - w->avi_rho * x[i];
        }
        /* v = Rinv' xtemp; d = b*scaling + M v (update_v / update_d) */
        for (i = 0; i < n; i++) {
            double s = 0.0;
            for (j = 0; j < n; j++) s += w->Rinv[j * n + i] * xtemp[j];
            w->v[i] = s;
        }
        for (i = 0; i < m; i++) {
            double mv = 0.0;
            for (j = 0; j < n; j++) mv += w->M[i * n + j] * w->v[j];
            w->du[i] = w->bu_user[i] * w->scaling[i] + mv;
            w->dl[i] = w->bl_user[i] * w->scaling[i] + mv;
        }
        fl = solve_inner(w, &it2, DINF);    /* warm: WS + E persist */
        tot += it2;
        if (fl < 0) { flag = fl; break; }
        /* y_inner = Rinv (u - v) (ldp2qp_solution) */
        for (j = 0; j < n; j++) {
            double s = 0.0;
            for (i = 0; i < n; i++)
                s += w->Rinv[j * n + i] * (w->u[i] - w->v[i]);
            yin[j] = s;
        }
        /* Newton-step progress bookkeeping (avi.c:44-61) */
        if (counter == terminate_limit) {
            double res2 = 0.0;
            for (i = 0; i < n; i++) {
                double d = x[i] - yin[i];
                res2 += d * d;
            }
            if (res2 > min_res) {           /* revert the Newton step */
                memcpy(x, xold, sizeof(double) * n);
                terminate_limit += 5;
                if (terminate_limit > 30) terminate_limit = 30;
            } else {
                min_res = res2;
                memcpy(y, yin, sizeof(double) * n);
            }
        } else {
            memcpy(y, yin, sizeof(double) * n);
        }
        /* stable active set -> exact KKT try (avi.c:65-79) */
        if (it2 == 1) {
            if (++counter == terminate_limit) {
                memcpy(xold, x, sizeof(double) * n);
                if (avi_kkt_solve(w) == 0 && avi_check_optimal(w)) {
                    flag = DAQP_TPU_OPTIMAL;
                    break;
                }
                goto deadline_check;        /* skip the DR update */
            }
        } else {
            counter = 0;
        }
        /* DR update: x <- (H+rho I)^{-1}(rho y + Hx + 0.5 Hsym (y - x))
         * (avi.c:84-96) */
        for (i = 0; i < n; i++) {
            xtemp[i] = w->avi_rho * y[i] + Hx[i];
            y[i] -= x[i];
        }
        for (i = 0; i < n; i++) {
            double s = 0.0;
            for (j = 0; j < n; j++) s += w->avi_Hsym[i * n + j] * y[j];
            xtemp[i] += 0.5 * s;
        }
        lu_solve(n, w->avi_LUHr, w->avi_pivr, xtemp, x);
deadline_check:
        if (w->time_limit > 0.0 && now_sec() > w->deadline) {
            flag = DAQP_TPU_TIMELIMIT;
            break;
        }
    }
    if (iters) *iters = tot > 0 ? tot : 1;
    if (flag == DAQP_TPU_OPTIMAL) {
        if (x_out) memcpy(x_out, x, sizeof(double) * n);
        if (fval) {
            double s = 0.0;
            for (i = 0; i < n; i++) s += w->f_user[i] * x[i];
            *fval = s;
        }
        if (lam_out) {
            /* KKT duals are already in the original constraint space */
            for (i = 0; i < m; i++) lam_out[i] = 0.0;
            for (i = 0; i < w->n_active; i++)
                lam_out[w->WS[i]] = w->lam_star[i];
        }
    }
    return flag;
}

int daqp_tpu_solve(DAQPTpuWork *w, double *x, double *lam, double *fval,
                   int *iters)
{
    int flag, it = 0;
    if (w->err0) { if (iters) *iters = 0; return w->err0; }
    if (w->time_limit > 0.0) w->deadline = now_sec() + w->time_limit;
    if (w->avi_mode)                    /* api.c:73-77 dispatch */
        return solve_avi(w, x, lam, fval, iters);
    flag = activate_warm(w, 0, w->m);
    if (flag < 0) { if (iters) *iters = 0; return flag; }
    if (w->lp_mode)
        return solve_lp(w, x, lam, fval, iters);
    flag = solve_inner(w, &it, 2.0 * w->fval_bound);
    if (iters) *iters = it;
    if (flag > 0) extract_sol(w, x, lam, fval);
    return flag;
}

/* grow the working-set capacity (slots for E/Mw/WS/scratch).  Only
 * valid with an empty working set (callers reset right after); needed
 * by the hierarchical walk, which softens level rows at runtime so the
 * setup-time K = n + ns + 1 bound (reference factorization.c:93-94
 * allows n_active up to n + ns_active) can be exceeded. */
static int grow_capacity(DAQPTpuWork *w, int K_new)
{
    double *E, *Mw, *lam, *lam_star, *sdir, *s1, *s2;
    int *WS, *iscr;
    if (K_new <= w->K) return 0;
    E = (double *)calloc((size_t)K_new * K_new, sizeof(double));
    Mw = (double *)malloc(sizeof(double) * (size_t)K_new * w->n);
    lam = (double *)calloc(K_new, sizeof(double));
    lam_star = (double *)calloc(K_new, sizeof(double));
    sdir = (double *)calloc(K_new, sizeof(double));
    s1 = (double *)calloc(K_new, sizeof(double));
    s2 = (double *)calloc(K_new, sizeof(double));
    WS = (int *)calloc(K_new, sizeof(int));
    iscr = (int *)calloc(K_new, sizeof(int));
    if (!E || !Mw || !lam || !lam_star || !sdir || !s1 || !s2 || !WS
        || !iscr) {
        free(E); free(Mw); free(lam); free(lam_star); free(sdir);
        free(s1); free(s2); free(WS); free(iscr);
        return -1;
    }
    free(w->E); free(w->Mw); free(w->lam); free(w->lam_star);
    free(w->sdir); free(w->scr1); free(w->scr2); free(w->WS);
    free(w->iscr);
    w->E = E; w->Mw = Mw; w->lam = lam; w->lam_star = lam_star;
    w->sdir = sdir; w->scr1 = s1; w->scr2 = s2; w->WS = WS;
    w->iscr = iscr; w->K = K_new;
    return 0;
}

/* post-hardening reactivation with dependent-entry drops
 * (hierarchical.c:72-95).  The reference reuses its LDL prefix; the
 * explicit inverse has no valid sub-prefix, so the whole set is rebuilt
 * — identical math, drops counted from the first in-level entry on. */
static void hiqp_reactivate(DAQPTpuWork *w, int start, int *nfree)
{
    int i, j, j0, k = w->n_active;
    int n_old = (k < w->n) ? k : w->n;
    int *ids = w->iscr;
    double *lams = w->scr2;
    /* drop the overdetermined tail entirely (hierarchical.c:77-80) */
    for (j = n_old; j < k; j++)
        w->sense[w->WS[j]] &= ~(DAQP_TPU_ACTIVE | DAQP_TPU_IMMUTABLE);
    for (j0 = 0; j0 < n_old && w->WS[j0] < start; j0++);
    for (i = 0; i < n_old; i++) {
        ids[i] = w->WS[i];
        lams[i] = w->lam_star[i];
        w->sense[w->WS[i]] &= ~DAQP_TPU_ACTIVE;
    }
    w->n_active = 0; w->ns_active = 0; w->sing_flag = 0;
    memset(w->E, 0, sizeof(double) * (size_t)w->K * w->K);
    for (i = 0; i < n_old; i++) {
        add_constraint(w, ids[i], lams[i]);
        if (w->sing_flag) {            /* dependent: drop, make mutable */
            w->n_active--;
            w->ns_active -=
                (w->sense[ids[i]] & DAQP_TPU_SOFT) != 0;
            w->sense[ids[i]] &= ~(DAQP_TPU_ACTIVE | DAQP_TPU_IMMUTABLE);
            w->sing_flag = 0;
        } else if (i >= j0 && (w->sense[ids[i]] & DAQP_TPU_IMMUTABLE)) {
            (*nfree)--;                /* DOF spent (hierarchical.c:94) */
        }
    }
}

int daqp_tpu_solve_hiqp(DAQPTpuWork *w, const int *break_points, int nh,
                        double *x, double *lam_out, double *fval,
                        int *iters)
{
    /* lexicographic level walk (daqp_hiqp, hierarchical.c:5-108) */
    int i, j, start, end, total = 0, flag = DAQP_TPU_OPTIMAL;
    int nfree = w->n;
    double *xold;
    if (w->err0) { if (iters) *iters = 0; return w->err0; }
    if (nh < 2) return daqp_tpu_solve(w, x, lam_out, fval, iters);
    if (w->time_limit > 0.0) w->deadline = now_sec() + w->time_limit;
    if (lam_out) for (i = 0; i < w->m; i++) lam_out[i] = 0.0;
    xold = (double *)malloc(sizeof(double) * w->n);
    if (!xold) return DAQP_TPU_NONCONVEX;
    {   /* capacity for the widest level's simultaneous soft rows */
        int wmax = 0;
        for (i = 1; i < nh; i++)
            if (break_points[i] - break_points[i - 1] > wmax)
                wmax = break_points[i] - break_points[i - 1];
        if (grow_capacity(w, w->n + wmax + 1) != 0) {
            free(xold);
            return DAQP_TPU_NONCONVEX;
        }
    }
    /* full restart from the setup state: reset_ws alone would strip the
     * auto-equality ACTIVE marks the level walk relies on, and the
     * freeze step perturbs d so a re-solve must restore it */
    w->n_active = 0; w->ns_active = 0; w->sing_flag = 0;
    memset(w->E, 0, sizeof(double) * (size_t)w->K * w->K);
    memcpy(w->sense, w->sense0, sizeof(int) * w->m);
    memcpy(w->du, w->du0, sizeof(double) * w->m);
    memcpy(w->dl, w->dl0, sizeof(double) * w->m);
    start = break_points[0];
    flag = activate_warm(w, 0, start);
    if (flag < 0) { free(xold); if (iters) *iters = 0; return flag; }
    flag = DAQP_TPU_OPTIMAL;
    for (i = 1; i < nh; i++) {
        int it2 = 0, fl;
        end = break_points[i];
        for (j = start; j < end; j++) {
            w->sense[j] |= DAQP_TPU_SOFT;
            if ((w->sense[j] & DAQP_TPU_ACTIVE) && !in_ws(w, j)) {
                w->sense[j] &= ~DAQP_TPU_ACTIVE;
                add_constraint(w, j,
                               (w->sense[j] & DAQP_TPU_LOWER) ? -1.0
                                                              : 1.0);
                if (w->sing_flag) {
                    free(xold);
                    return DAQP_TPU_OVERDETERMINED;
                }
            }
        }
        w->m_price = end;             /* truncate pricing to the level
                                       * (reference sets work->m,
                                       * hierarchical.c:24) */
        memcpy(xold, w->u, sizeof(double) * w->n);
        fl = solve_inner(w, &it2, DINF);
        total += it2;
        if (fl < 0) {                  /* restore pre-level point and
                                        * report 3 (no DOF left) */
            memcpy(w->u, xold, sizeof(double) * w->n);
            flag = 3;
            break;
        }
        if (total >= w->iter_limit) { flag = DAQP_TPU_ITERLIMIT; break; }
        /* freeze the level's optimal soft violations into d
         * (hierarchical.c:51-65) */
        for (j = 0; j < w->n_active; j++) {
            int id = w->WS[j];
            if (w->sense[id] & DAQP_TPU_SOFT) {
                double wv = w->lam_star[j] * w->rho_soft;
                if (wv < -w->ptol) w->dl[id] += wv;
                else if (wv > w->ptol) w->du[id] += wv;
                if (lam_out)
                    lam_out[id] = wv + ((w->sense[id] & DAQP_TPU_LOWER)
                                        ? -1e-14 : 1e-14);
            }
        }
        for (j = start; j < end; j++) w->sense[j] &= ~DAQP_TPU_SOFT;
        if (i == nh - 1) break;
        hiqp_reactivate(w, start, &nfree);
        if (nfree <= 0) break;         /* no degrees of freedom left */
        start = end;
    }
    w->m_price = w->m;
    if (iters) *iters = total;
    if (flag > 0 && flag != 3) {
        /* u already holds the last solved level's optimum; lam_star is
         * stale after hiqp_reactivate so never recompute u from it */
        extract_sol(w, x, NULL, fval);
    } else if (flag == 3 && x) {
        int jj;
        for (jj = 0; jj < w->n; jj++) {
            double s2 = 0.0;
            int ii;
            for (ii = 0; ii < w->n; ii++)
                s2 += w->Rinv[jj * w->n + ii] * (w->u[ii] - w->v[ii]);
            x[jj] = s2;
        }
    }
    free(xold);
    return flag;
}

int daqp_tpu_solve_miqp(DAQPTpuWork *w, double *x, double *lam_out,
                        double *fval, int *iters, int *nodes)
{
    /* DFS BnB over BINARY rows (bnb.c:23-156 semantics; see
     * codegen.py _C_BNB for the single-problem twin).  Dominance bound
     * with rel/abs suboptimality folding (bnb.c:29-31,68). */
    int nb = w->nb, n = w->n, K = w->K;
    int *stack_id, *stack_side, *stack_depth, *path_id, *path_side;
    int *inc_ws;
    double *inc_u, *inc_lam;
    int n_nodes = 1, total_iters = 0, total_nodes = 0, have_inc = 0;
    int i, l, inc_k = 0, flag_out, timed_out = 0;
    double inc_ss = 0.0, inc_fv = 0.0;
    double eps_r = 1.0 / (1.0 + w->rel_subopt);
    double bound = (2.0 * w->fval_bound - 2.0 * w->abs_subopt) * eps_r;
    if (w->err0) { if (iters) *iters = 0; return w->err0; }
    if (nb == 0) return daqp_tpu_solve(w, x, lam_out, fval, iters);
    stack_id = (int *)malloc(sizeof(int) * (2 * nb + 2));
    stack_side = (int *)malloc(sizeof(int) * (2 * nb + 2));
    stack_depth = (int *)malloc(sizeof(int) * (2 * nb + 2));
    path_id = (int *)malloc(sizeof(int) * (nb + 1));
    path_side = (int *)malloc(sizeof(int) * (nb + 1));
    inc_ws = (int *)malloc(sizeof(int) * K);
    inc_u = (double *)malloc(sizeof(double) * n);
    inc_lam = (double *)malloc(sizeof(double) * K);
    if (!stack_id || !stack_side || !stack_depth || !path_id || !path_side
        || !inc_ws || !inc_u || !inc_lam) {
        free(stack_id); free(stack_side); free(stack_depth);
        free(path_id); free(path_side); free(inc_ws); free(inc_u);
        free(inc_lam);
        return DAQP_TPU_NONCONVEX;
    }
    if (w->time_limit > 0.0) w->deadline = now_sec() + w->time_limit;
    stack_id[0] = -1; stack_side[0] = 0; stack_depth[0] = 0;
    while (n_nodes > 0) {
        int bid, side, d, ok = 1, flag, it2 = 0;
        /* tree-level wall-clock check every 32 nodes (bnb.c:51-59) */
        if (w->time_limit > 0.0 && (total_nodes & 31) == 31
            && now_sec() > w->deadline) {
            timed_out = 1;
            break;
        }
        n_nodes--;
        bid = stack_id[n_nodes]; side = stack_side[n_nodes];
        d = stack_depth[n_nodes];
        if (bid >= 0) { path_id[d - 1] = bid; path_side[d - 1] = side; }
        reset_ws(w);
        for (i = 0; i < nb; i++)
            w->sense[w->bin_ids[i]] &= ~DAQP_TPU_IMMUTABLE;
        for (i = 0; i < d; i++) {
            int b = path_id[i];
            if (path_side[i]) w->sense[b] |= DAQP_TPU_LOWER;
            else w->sense[b] &= ~DAQP_TPU_LOWER;
            add_constraint(w, b, path_side[i] ? -1.0 : 1.0);
            w->sense[b] |= DAQP_TPU_IMMUTABLE;
            if (w->sing_flag) { ok = 0; break; }
        }
        total_nodes++;
        if (!ok) continue;
        flag = solve_inner(w, &it2, bound);
        total_iters += it2;
        if (flag < 0) continue;
        {
            int jb = -1, near_lower = 0, side_first;
            double bestdist = DINF;
            for (i = 0; i < nb; i++) {
                int b = w->bin_ids[i];
                double mu = 0.0, mid;
                if (w->sense[b] & DAQP_TPU_IMMUTABLE) continue;
                for (l = 0; l < n; l++)
                    mu += w->M[b * n + l] * w->u[l];
                if (w->du[b] - mu < w->ptol || mu - w->dl[b] < w->ptol)
                    continue;
                mid = 0.5 * (w->du[b] + w->dl[b]);
                if (fabs(mu - mid) < bestdist) {
                    bestdist = fabs(mu - mid);
                    jb = b; near_lower = (mu < mid);
                }
            }
            if (jb < 0) {             /* integer feasible: incumbent */
                if (w->last_fv < bound) {
                    inc_fv = w->last_fv;
                    bound = (w->last_fv - 2.0 * w->abs_subopt) * eps_r;
                    have_inc = 1; inc_ss = w->last_ss;
                    for (i = 0; i < n; i++) inc_u[i] = w->u[i];
                    inc_k = w->n_active;
                    for (i = 0; i < inc_k; i++) {
                        inc_ws[i] = w->WS[i];
                        inc_lam[i] = w->lam_star[i];
                    }
                }
                continue;
            }
            if (d >= nb) continue;
            side_first = near_lower ? 1 : 0;
            stack_id[n_nodes] = jb; stack_side[n_nodes] = 1 - side_first;
            stack_depth[n_nodes] = d + 1; n_nodes++;
            stack_id[n_nodes] = jb; stack_side[n_nodes] = side_first;
            stack_depth[n_nodes] = d + 1; n_nodes++;
        }
    }
    for (i = 0; i < nb; i++)
        w->sense[w->bin_ids[i]] &= ~DAQP_TPU_IMMUTABLE;
    if (iters) *iters = total_iters;
    if (nodes) *nodes = total_nodes;
    if (!have_inc) {
        reset_ws(w);
        flag_out = DAQP_TPU_INFEASIBLE;
    } else {
        for (i = 0; i < n; i++) w->u[i] = inc_u[i];
        w->last_fv = inc_ss + 0.0; w->last_ss = inc_ss;
        for (i = 0; i < n; i++) w->last_fv += inc_u[i] * inc_u[i];
        w->n_active = inc_k;
        for (i = 0; i < inc_k; i++) {
            w->WS[i] = inc_ws[i];
            w->lam_star[i] = inc_lam[i];
        }
        extract_sol(w, x, lam_out, fval);
        /* leave a clean warm start on the incumbent (E/Mw belong to the
         * last explored node) */
        reset_ws(w);
        for (i = 0; i < inc_k; i++) {
            w->sense[inc_ws[i]] |= DAQP_TPU_ACTIVE;
            if (inc_lam[i] < 0) w->sense[inc_ws[i]] |= DAQP_TPU_LOWER;
            else w->sense[inc_ws[i]] &= ~DAQP_TPU_LOWER;
        }
        flag_out = timed_out ? DAQP_TPU_TIMELIMIT : DAQP_TPU_OPTIMAL;
        (void)inc_fv;
    }
    if (timed_out) flag_out = DAQP_TPU_TIMELIMIT;
    free(stack_id); free(stack_side); free(stack_depth);
    free(path_id); free(path_side); free(inc_ws); free(inc_u);
    free(inc_lam);
    return flag_out;
}

/* ------------- masked update + warm-start/extraction tail ------------- */

int daqp_tpu_update_masked(DAQPTpuWork *w, int mask, const double *H,
                           const double *f, const double *A,
                           const double *bupper, const double *blower,
                           const int *sense)
{
    int i, j, need_struct;
    int n = w->n, m = w->m, ms = w->ms;
    if (w->avi_mode) return DAQP_TPU_BADMASK;
    if ((mask & DAQP_TPU_UPDATE_Rinv) && (w->lp_mode || !H))
        return DAQP_TPU_BADMASK;

    /* stash the new raw data */
    if ((mask & DAQP_TPU_UPDATE_v) && f)
        memcpy(w->f_user, f, sizeof(double) * n);
    if ((mask & DAQP_TPU_UPDATE_M) && A && m > ms)
        memcpy(w->A_user, A, sizeof(double) * (size_t)(m - ms) * n);
    if (mask & DAQP_TPU_UPDATE_d) {
        if (bupper) memcpy(w->bu_user, bupper, sizeof(double) * m);
        if (blower) memcpy(w->bl_user, blower, sizeof(double) * m);
    }
    if ((mask & DAQP_TPU_UPDATE_sense) && sense)
        memcpy(w->sense_user, sense, sizeof(int) * m);

    if (mask & DAQP_TPU_UPDATE_Rinv) {
        w->err0 = factorize_H(w, H);
        if (w->err0) return w->err0;
        /* both M and v embed R^-1 */
        mask |= DAQP_TPU_UPDATE_M | DAQP_TPU_UPDATE_v;
    }
    if (mask & DAQP_TPU_UPDATE_v) compute_v_w(w);

    need_struct = (mask & (DAQP_TPU_UPDATE_Rinv | DAQP_TPU_UPDATE_M
                           | DAQP_TPU_UPDATE_sense)) != 0;
    if (!need_struct && (mask & (DAQP_TPU_UPDATE_v | DAQP_TPU_UPDATE_d))) {
        /* the reference re-runs daqp_check_bounds on any v/d update
         * (utils.c:40-45): inverted bounds -> infeasible; a NEW equality
         * escalates to the structural path (do_activate) */
        for (i = 0; i < m; i++) {
            double diff = w->bu_user[i] - w->bl_user[i];
            double nrm2 = 0.0;
            if (!(w->sense[i] & DAQP_TPU_IMMUTABLE)) {
                if (diff < -w->ptol) return DAQP_TPU_INFEASIBLE;
                if (diff < w->ztol && !(w->sense_user[i] & DAQP_TPU_SOFT))
                    need_struct = 1;
            }
            for (j = 0; j < n; j++)
                nrm2 += w->M[i * n + j] * w->M[i * n + j];
            if (nrm2 < w->ztol
                && !(w->sense_user[i]
                     & (DAQP_TPU_IMMUTABLE | DAQP_TPU_SOFT))
                && (w->bu_user[i] < -w->ztol || w->bl_user[i] > w->ztol))
                return DAQP_TPU_INFEASIBLE;
        }
        if (w->err0 == DAQP_TPU_INFEASIBLE) w->err0 = 0;
    }

    if (mask & DAQP_TPU_UPDATE_M) build_M_w(w);
    if (need_struct) {
        int err;
        /* "Internal factorizations need to be redone" (utils.c:381):
         * E/Mw reference the old rows; reset before re-derivation so a
         * soft-capacity grow_capacity sees an empty working set. */
        reset_ws(w);
        err = derive_rows_w(w, (mask & DAQP_TPU_UPDATE_M) != 0);
        if (err) { w->err0 = err; return err; }
        w->err0 = 0;
    }
    if (mask & (DAQP_TPU_UPDATE_Rinv | DAQP_TPU_UPDATE_M
                | DAQP_TPU_UPDATE_v | DAQP_TPU_UPDATE_d))
        compute_d_w(w);
    return 0;
}

double daqp_tpu_soft_slack(const DAQPTpuWork *w)
{
    return w->last_ss;
}

void daqp_tpu_primal_init_active(DAQPTpuWork *w, const double *x)
{
    /* reference daqp_primal_init_active (api.c:555-592): activate every
     * mutable constraint within tol of a bound at x (upper checked
     * first); general rows use the raw A kept from setup. */
    int i, j;
    const double tol = 1e-9;
    for (i = 0; i < w->m; i++) {
        double Ax, slack;
        if (w->sense[i] & DAQP_TPU_IMMUTABLE) continue;
        if (i < w->ms) Ax = x[i];
        else {
            Ax = 0.0;
            for (j = 0; j < w->n; j++)
                Ax += w->A_user[(i - w->ms) * w->n + j] * x[j];
        }
        slack = Ax - w->bu_user[i];
        if (slack < tol && slack > -tol) {
            w->sense[i] |= DAQP_TPU_ACTIVE;
            w->sense[i] &= ~DAQP_TPU_LOWER;
        } else {
            slack = Ax - w->bl_user[i];
            if (slack < tol && slack > -tol)
                w->sense[i] |= DAQP_TPU_ACTIVE | DAQP_TPU_LOWER;
        }
    }
}

void daqp_tpu_dual_init_active(DAQPTpuWork *w, const double *lam)
{
    /* reference daqp_dual_init_active (api.c:596-609) */
    int i;
    const double tol = 1e-12;
    for (i = 0; i < w->m; i++) {
        if (w->sense[i] & DAQP_TPU_IMMUTABLE) continue;
        if (lam[i] > tol) {
            w->sense[i] |= DAQP_TPU_ACTIVE;
            w->sense[i] &= ~DAQP_TPU_LOWER;
        } else if (lam[i] < -tol) {
            w->sense[i] |= DAQP_TPU_ACTIVE | DAQP_TPU_LOWER;
        }
    }
}

void daqp_tpu_set_primal_start(DAQPTpuWork *w, const double *x)
{
    /* reference daqp_set_primal_start (api.c:612-617): seeds the
     * proximal / LP outer iterate (work->x is that iterate there). */
    memcpy(w->x_lp, x, sizeof(double) * w->n);
}

int daqp_tpu_minrep(int *is_redundant, const double *A, const double *b,
                    int n, int m, int ms)
{
    /* reference daqp_minrep (api.c:507-534) + daqp_minrep_work
     * (utils.c:699-726): row i redundant iff the feasibility LDP with
     * row i forced active (equality at its upper bound) is infeasible;
     * an optimal solve also certifies every row in its working set as
     * necessary.  Row normalization inside setup leaves the verdicts
     * unchanged (scale-invariant).  H = I makes the LDP transform the
     * identity. */
    int i, j, flag;
    DAQPTpuWork *w;
    double *bl = (double *)malloc(sizeof(double) * (m ? m : 1));
    double *H = (double *)calloc((size_t)n * n, sizeof(double));
    if (!bl || !H) { free(bl); free(H); return DAQP_TPU_NONCONVEX; }
    for (i = 0; i < m; i++) bl[i] = -DINF;
    for (i = 0; i < n; i++) H[i * n + i] = 1.0;
    w = daqp_tpu_setup(n, m, ms, H, NULL, A, b, bl, NULL);
    free(bl); free(H);
    if (!w) return DAQP_TPU_NONCONVEX;
    if (w->err0) { flag = w->err0; daqp_tpu_free(w); return flag; }
    for (i = 0; i < m; i++) is_redundant[i] = -1;
    for (i = 0; i < m; i++) {
        int it = 0, ex;
        if (is_redundant[i] != -1) continue;
        if (w->sense[i] & DAQP_TPU_IMMUTABLE) {
            /* zero row marked immutable by normalization: 0 <= b_i is
             * vacuous (a violated zero row fails setup above) */
            is_redundant[i] = 1;
            continue;
        }
        reset_ws(w);
        w->sense[i] &= ~DAQP_TPU_LOWER;
        add_constraint(w, i, 1.0);
        w->sense[i] |= DAQP_TPU_IMMUTABLE;  /* pin it in the set */
        ex = solve_inner(w, &it, DINF);
        w->sense[i] &= ~DAQP_TPU_IMMUTABLE;
        if (ex == DAQP_TPU_INFEASIBLE) {
            is_redundant[i] = 1;
        } else {
            is_redundant[i] = 0;
            if (ex == DAQP_TPU_OPTIMAL)
                for (j = 0; j < w->n_active; j++)
                    is_redundant[w->WS[j]] = 0;
        }
    }
    daqp_tpu_free(w);
    return 0;
}
