"""Warm-start helpers: derive a starting active set from a primal or dual
iterate by setting sense bits.

Reference: ``daqp_primal_init_active`` (src/api.c:555-592),
``daqp_dual_init_active`` (src/api.c:596-609), ``daqp_first_violating``
(src/api.c:538-550).  The resulting sense vector is consumed by
``activate_constraints`` at solve time, exactly as the reference's
``daqp_activate_constraints`` consumes ACTIVE bits.
"""
from __future__ import annotations

import jax.numpy as jnp

from .types import ACTIVE, IMMUTABLE, LOWER


def primal_init_active(x, A, bupper, blower, sense, ms: int, tol=1e-9):
    """Activate constraints that are (near-)tight at ``x``
    (``daqp_primal_init_active``, api.c:555-592).  Returns updated sense."""
    x = jnp.asarray(x)
    A = jnp.atleast_2d(A)
    sense = jnp.asarray(sense, jnp.int32)
    vals = jnp.concatenate([x[:ms], A @ x]) if ms > 0 else A @ x
    up_tight = jnp.abs(vals - jnp.asarray(bupper)) < tol
    lo_tight = jnp.abs(vals - jnp.asarray(blower)) < tol
    mutable = (sense & IMMUTABLE) == 0
    sense = jnp.where(mutable & up_tight,
                      (sense | ACTIVE) & ~LOWER, sense)
    sense = jnp.where(mutable & ~up_tight & lo_tight,
                      sense | (ACTIVE | LOWER), sense)
    return sense.astype(jnp.int32)


def dual_init_active(lam, sense, tol=1e-12):
    """Activate constraints by multiplier sign (``daqp_dual_init_active``,
    api.c:596-609).  Returns updated sense."""
    lam = jnp.asarray(lam)
    sense = jnp.asarray(sense, jnp.int32)
    mutable = (sense & IMMUTABLE) == 0
    sense = jnp.where(mutable & (lam > tol), (sense | ACTIVE) & ~LOWER,
                      sense)
    sense = jnp.where(mutable & (lam < -tol), sense | (ACTIVE | LOWER),
                      sense)
    return sense.astype(jnp.int32)


def first_violating(x, A, bupper, blower, ms: int, tol=0.0):
    """Index of the first constraint violated at ``x``; m if none
    (``daqp_first_violating``, api.c:538-550)."""
    x = jnp.asarray(x)
    A = jnp.atleast_2d(A)
    m = len(bupper)
    vals = jnp.concatenate([x[:ms], A @ x]) if ms > 0 else A @ x
    viol = (vals > jnp.asarray(bupper) + tol) | \
        (vals < jnp.asarray(blower) - tol)
    return jnp.where(jnp.any(viol), jnp.argmax(viol), m).astype(jnp.int32)
