"""Batched feasibility check of candidate points.

Analog of the SDP constraint handler's check callback
(SCIPconsSdpCheckSdpCons, cons_sdp.c:672-729: smallest eigenvalue of
Z(y) >= -feastol per block) plus LP rows and bounds, and of the
independent solution checker (sdpsolchecker.c:58).  One batched eigh per
size bucket decides feasibility for a whole batch of points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from scipsdp_tpu.ops.eigen import min_eigenvalue
from scipsdp_tpu.ops.ipm import IPMData


@functools.partial(jax.jit, static_argnames=("feastol",))
def check_points(data: IPMData, y: jnp.ndarray, lb: jnp.ndarray,
                 ub: jnp.ndarray, feastol: float = 1e-5):
    """y: (B, m) candidate points (no penalty var). Returns (feasible, viol).

    ``viol`` is the maximum constraint violation (0 if feasible).
    """
    B = y.shape[0]
    yx = jnp.concatenate([y, jnp.zeros((B, 1), y.dtype)], axis=1)
    viol = jnp.zeros((B,), yx.dtype)
    for t in range(data.nbuckets):
        Z = jnp.einsum("kjab,xj->xkab", data.A[t], yx) - data.C[t][None]
        lam = min_eigenvalue(
            Z, jnp.broadcast_to(data.dimmask[t][None], Z.shape[:-1]))
        viol = jnp.maximum(viol, jnp.max(jnp.maximum(-lam, 0.0), axis=1))
    Gy = jnp.einsum("pm,xm->xp", data.G, yx)
    lp_viol = jnp.max(jnp.maximum(data.h[None] - Gy, 0.0), axis=1)
    lb_viol = jnp.max(jnp.maximum(jnp.where(lb > -1e19, lb - y, 0.0), 0.0),
                      axis=1)
    ub_viol = jnp.max(jnp.maximum(jnp.where(ub < 1e19, y - ub, 0.0), 0.0),
                      axis=1)
    viol = jnp.maximum(viol, jnp.maximum(lp_viol,
                                         jnp.maximum(lb_viol, ub_viol)))
    return viol <= feastol, viol
