"""Debug the defaults-match-plain SW dense-kernel divergence (one lane
ends 2.45e-4 from the plain kernel).  Which side is off the f64 lifted
truth, and what differs structurally (working set, iterations, flags)?

Resolution (round 4): the SW side exited SOFT_OPTIMAL with a hard ACTIVE
row violated by 2.4e-4 — refinement stalling through a drifted f32 E;
fixed by ``pallas_batch.newton_refresh`` in ``polish``.  CAVEAT reading
this script's "lifted truth" columns: x64 is NOT enabled here, so the
"f64" lift/single-instance solves silently truncate to f32 (the
2.1e-3-level "hard_viol" on the lift is that truncation, not a solver
defect — with jax_enable_x64 the lift solves to 5e-14)."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from daqp_tpu import batch as batch_mod
from daqp_tpu.api import _as_settings
from daqp_tpu.types import SOFT, SoftWeights
from tests.test_pallas_sw import _make_batch
from tests.test_soft_weights import _lift_and_solve

B, n, m = 128, 6, 14
soft_rows = [0, 3, 7, 11]
Hs, fs, As, bus, bls, sense, _, _ = _make_batch(B, n, m, soft_rows, seed=3)
for b in range(B):
    R = np.linalg.cholesky(np.float64(Hs[b])).T
    nrm = np.linalg.norm(np.float64(As[b]) @ np.linalg.inv(R), axis=1)
    As[b] = As[b] / nrm[:, None]
    bus[b] = bus[b] / nrm
    bls[b] = bls[b] / nrm
rho = 1.0
st = _as_settings({"iter_limit": 500, "rho_soft": rho}, jnp.float32)
zm = jnp.zeros((B, m), jnp.float32)
rm = jnp.full((B, m), rho, jnp.float32)
sw = SoftWeights(d_ls=zm, d_us=zm, rho_ls=rm, rho_us=rm)

res_sw = batch_mod.solve_batch_pallas_jit(
    jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
    jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
    ms=0, interpret=True, sw=sw)
res_pl = batch_mod.solve_batch_pallas_jit(
    jnp.asarray(Hs), jnp.asarray(fs), jnp.asarray(As),
    jnp.asarray(bus), jnp.asarray(bls), jnp.asarray(sense), st,
    ms=0, interpret=True, has_soft=True)
x_sw = np.asarray(res_sw.x)
x_pl = np.asarray(res_pl.x)
dx = np.abs(x_sw - x_pl).max(axis=1)
worst = np.argsort(dx)[::-1][:5]
print("worst lanes:", worst, dx[worst])
d = np.zeros(m)
r = np.full(m, rho)
for b in worst:
    x_ref = _lift_and_solve(
        np.float64(Hs[b]), np.float64(fs[b]), np.float64(As[b]),
        np.float64(bus[b]), np.float64(bls[b]), soft_rows,
        d, d, r, r)
    e_sw = np.abs(x_sw[b] - x_ref).max()
    e_pl = np.abs(x_pl[b] - x_ref).max()
    print(f"lane {b}: dx={dx[b]:.3e} err_sw={e_sw:.3e} err_pl={e_pl:.3e} "
          f"flags sw={int(np.asarray(res_sw.exitflag)[b])} "
          f"pl={int(np.asarray(res_pl.exitflag)[b])} "
          f"iters sw={int(np.asarray(res_sw.iterations)[b])} "
          f"pl={int(np.asarray(res_pl.iterations)[b])}")
    lam_sw = np.asarray(res_sw.lam)[b]
    lam_pl = np.asarray(res_pl.lam)[b]
    ws_sw = np.nonzero(np.abs(lam_sw) > 1e-9)[0]
    ws_pl = np.nonzero(np.abs(lam_pl) > 1e-9)[0]
    print(f"  WS sw={ws_sw} pl={ws_pl}")
    print(f"  lam sw={lam_sw[ws_sw]}")
    print(f"  lam pl={lam_pl[ws_pl]}")
    print(f"  fval sw={np.asarray(res_sw.fval)[b]:.9f} "
          f"pl={np.asarray(res_pl.fval)[b]:.9f} "
          f"slack sw={np.asarray(res_sw.soft_slack)[b]:.3e} "
          f"pl={np.asarray(res_pl.soft_slack)[b]:.3e}")

# --- lane 82 deep dive: lifted objective at each point + f64 plain-soft
print("\n--- lane 82 ---")
b = 82
x_ref = _lift_and_solve(np.float64(Hs[b]), np.float64(fs[b]),
                        np.float64(As[b]), np.float64(bus[b]),
                        np.float64(bls[b]), soft_rows, d, d, r, r)


def lifted_obj(x):
    # min-norm slack completion: t_i = max(0, violation)/sqrt(rho)
    H64, f64_, A64 = map(np.float64, (Hs[b], fs[b], As[b]))
    viol_u = np.maximum(A64 @ x - np.float64(bus[b]), 0.0)
    viol_l = np.maximum(np.float64(bls[b]) - A64 @ x, 0.0)
    sr = np.array(soft_rows)
    tu = viol_u[sr] / np.sqrt(r[sr])
    tl = viol_l[sr] / np.sqrt(r[sr])
    hard = [i for i in range(m) if i not in soft_rows]
    hv = max(viol_u[hard].max(), viol_l[hard].max())
    return (0.5 * x @ H64 @ x + f64_ @ x
            + 0.5 * ((tu + d[sr] * np.sqrt(r[sr])) ** 2).sum()
            + 0.5 * ((tl + d[sr] * np.sqrt(r[sr])) ** 2).sum(), hv)


for nm, xx in [("ref", x_ref), ("sw", np.float64(x_sw[b])),
               ("pl", np.float64(x_pl[b]))]:
    J, hv = lifted_obj(xx)
    print(f"{nm}: J={J:.9f} hard_viol={hv:.3e}")

# f64 single-instance plain-soft solve of the same lane
import daqp_tpu
st64 = _as_settings({"iter_limit": 500, "rho_soft": rho}, jnp.float64)
r64 = daqp_tpu.quadprog(np.float64(Hs[b]), np.float64(fs[b]),
                        np.float64(As[b]), np.float64(bus[b]),
                        np.float64(bls[b]), sense=sense[b],
                        settings={"iter_limit": 500, "rho_soft": rho},
                        dtype=jnp.float64)
x64 = np.asarray(r64.x)
print("f64 plain-soft flag", int(np.asarray(r64.exitflag)),
      "err vs ref", np.abs(x64 - x_ref).max(),
      "J", lifted_obj(np.float64(x64)))
print("err sw vs x64", np.abs(x_sw[b] - x64).max(),
      "err pl vs x64", np.abs(x_pl[b] - x64).max())
