"""AOT warm-up for the Pallas kernel tiers.

Settings on the kernel tiers are compile-time constants (a traced scalar
inside a Mosaic kernel would force scalar-prefetch plumbing through every
pass), so changing ``primal_tol``/``pricing``/... triggers a fresh Mosaic
compile — measured at 15+ minutes for a new (n, m) shape on this
toolchain.  The reference has no such phase because its settings live in
a runtime struct (include/types.h:52-74) — the TPU-native analogue of
its "setup" phase (api.c setup/format split) is paying the compile once,
at deploy time, here.

``warmup`` AOT-compiles the requested tier entry points for exact
(B, n, m) shapes via ``jax.jit(...).lower(...).compile()`` — no problem
data is executed.  Compiled executables land in BOTH the in-process jit
cache and the persistent compilation cache
(``jax.config.jax_compilation_cache_dir``), so a production service (or
a toolchain-pinned container image bake step) runs this once and every
later process start hits the disk cache instead of Mosaic.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .types import Settings


def _sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def warmup(n: int, m: int, B: int,
           settings: Optional[Settings] = None,
           tiers: Sequence[str] = ("hard",),
           ms: int = 0,
           dtype=jnp.float32) -> dict:
    """AOT-compile kernel-tier entry points for exact (B, n, m) shapes.

    ``tiers``: any of ``"hard"`` (slot kernel), ``"soft"`` (dense-mask
    plain-soft), ``"sw"`` (dense-mask SOFT_WEIGHTS), ``"flat"`` (XLA slot
    tier — cheap, included for completeness).  Returns a dict of
    tier -> compiled executable (also retained by jit's own cache, so
    the return value can be discarded).

    B must be a multiple of 128 for the kernel tiers (the driver pads
    otherwise — warm the padded size you will actually run).
    """
    from . import batch as batch_mod
    from .api import _as_settings
    from .types import SoftWeights

    st = settings if isinstance(settings, Settings) \
        else _as_settings(settings, dtype)
    Hs = _sds((B, n, n), dtype)
    fs = _sds((B, n), dtype)
    As = _sds((B, m, n), dtype)
    bs = _sds((B, m), dtype)
    sn = _sds((B, m), jnp.int32)
    out = {}
    for tier in tiers:
        if tier == "flat":
            out[tier] = batch_mod.solve_batch_flat_jit.lower(
                Hs, fs, As, bs, bs, sn, st, ms=ms, K=n + 1).compile()
        elif tier == "hard":
            out[tier] = batch_mod._solve_batch_pallas_impl.lower(
                Hs, fs, As, bs, bs, sn, st, ms=ms,
                has_soft=False).compile()
        elif tier == "soft":
            out[tier] = batch_mod._solve_batch_pallas_impl.lower(
                Hs, fs, As, bs, bs, sn, st, ms=ms,
                has_soft=True).compile()
        elif tier == "sw":
            sw = SoftWeights(bs, bs, bs, bs)
            out[tier] = batch_mod._solve_batch_pallas_impl.lower(
                Hs, fs, As, bs, bs, sn, st, ms=ms, has_soft=True,
                sw=sw).compile()
        else:
            raise ValueError(f"unknown tier {tier!r}; expected "
                             "hard/soft/sw/flat")
    return out
