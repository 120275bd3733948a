"""Batched primal-dual interior-point SDP solver.

This is the TPU-native replacement for the reference's SDP back-ends
(src/sdpi/sdpisolver_{dsdp,sdpa,mosek}.c) *and* the presolve contract of the
solver-independent interface (SCIPsdpiSolve, src/sdpi/sdpi.c:3123-3650),
fused into one jitted function over a *batch* of SDPs that share problem
data (A, A_0, LP rows) and differ per instance in variable bounds and
objective — exactly the shape of branch-and-bound node relaxations.

Problem form (the reference dual form, sdpi.c:37-58), per batch instance:

    min  b^T y
    s.t. Z^k(y) = sum_j A^k_j y_j - A^k_0  >= 0 (PSD)   for blocks k
         G y >= h                                         (LP rows, >=-form)
         l <= y <= u

The *penalty formulation* (sdpisolver.h:237-245; sdpi.c:3437-3599) is built
in structurally: variable index m (the last one) is the penalty variable r
with coefficient matrix I on every block and coefficient 1 on every LP row.
Callers select the mode purely through bounds and objective:

  * direct solve:      lb[m] = ub[m] = 0 (r fixed), b[m] = 0
  * penalty solve:     lb[m] = 0, ub[m] = +inf,     b[m] = Gamma
  * feasibility probe: penalty bounds, b[:m] = 0, b[m] = 1  (Gamma = 1,
    objective zeroed; optimal r > peninfeasadjust*feastol => infeasible,
    sdpi.c:3450-3490)

Algorithm: infeasible-start Mehrotra predictor-corrector with the HKM
direction; Schur complement M_ij = sum_k tr(A_i X A_j S^{-1}) plus diagonal
contributions of LP rows and bounds; per-instance convergence masks so one
batch runs until every instance is done.

Presolve (vectorized analog of sdpi.c:3190-3275 and prepareLPData
sdpi.c:1131): bound-conflict detection, fixed-variable elimination by
masking, LP rows over fixed variables checked & dropped, single-free-
variable rows converted to bounds, all-variables-fixed instances decided by
a batched eigenvalue check (checkFixedFeasibilitySdp, sdpi.c:1377).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scipsdp_tpu.models.problem import DenseSDPData
from scipsdp_tpu.ops.eigen import (
    chol_solve,
    max_step_pos,
    max_step_psd,
    max_step_psd_power,
    min_eigenvalue,
    spd_inverse,
    sym,
)
from scipsdp_tpu.utils.config import IPMSettings
from scipsdp_tpu.utils.status import SolverResultStatus

INF_THRESH = 1e19  # values beyond this are treated as infinite


def _schur_product(Wall: jnp.ndarray, settings: IPMSettings) -> jnp.ndarray:
    """M = Wall @ Wall^T per batch element — THE hot matmul of the IPM.

    Default: one XLA batched matmul (already MXU-shaped).  With
    ``settings.use_pallas`` a hand-written Pallas TPU kernel
    (ops/pallas_kernels.py) computes the same product with explicit tiling.
    """
    if settings.use_pallas:
        from scipsdp_tpu.ops.pallas_kernels import schur_wwt
        return schur_wwt(Wall)
    return jnp.einsum("xif,xjf->xij", Wall, Wall)



@dataclasses.dataclass(frozen=True)
class IPMData:
    """Static (per-problem) device arrays for the batched solver.

    Shapes: K blocks padded to size n; mp = nvars + 1 variables, index
    ``nvars`` being the structural penalty variable r; p LP rows in
    >=-form (at least one row; a trivially-true dummy is added if the
    problem has none).
    """

    A: jnp.ndarray        # (K, mp, n, n)
    C: jnp.ndarray        # (K, n, n)  constant matrices A_0, padding diag -1
    G: jnp.ndarray        # (p, mp)    penalty column = 1
    h: jnp.ndarray        # (p,)
    dimmask: jnp.ndarray  # (K, n) bool
    b_base: jnp.ndarray   # (mp,) objective with b[m] = 0
    nvars: int            # m (without penalty var)
    ndim_sdp: int         # total real SDP dimensions (for mu)

    def tree_flatten(self):
        return ((self.A, self.C, self.G, self.h, self.dimmask, self.b_base),
                (self.nvars, self.ndim_sdp))

    @classmethod
    def tree_unflatten(cls, aux, children):
        A, C, G, h, dimmask, b_base = children
        return cls(A, C, G, h, dimmask, b_base, aux[0], aux[1])


jax.tree_util.register_pytree_node(
    IPMData, IPMData.tree_flatten, IPMData.tree_unflatten
)


def build_ipm_data(dense: DenseSDPData, dtype=jnp.float64) -> IPMData:
    """Append the structural penalty variable and pad degenerate shapes."""
    m = dense.nvars
    K = max(dense.nblocks, 1)
    n = max(dense.blocksize, 1)
    mp = m + 1

    A = np.zeros((K, mp, n, n))
    C = np.zeros((K, n, n))
    dimmask = np.zeros((K, n), dtype=bool)
    if dense.nblocks > 0:
        A[: dense.nblocks, :m, : dense.blocksize, : dense.blocksize] = dense.A
        C[: dense.nblocks, : dense.blocksize, : dense.blocksize] = dense.C
        dimmask[: dense.nblocks, : dense.blocksize] = dense.dimmask
    # blocks beyond the real ones (only the K=0 dummy) are fully padded
    for k in range(dense.nblocks if dense.nblocks > 0 else 0, K):
        for d in range(n):
            C[k, d, d] = -1.0
    if dense.nblocks > 0:
        # ensure padding diagonal of C is -1 wherever dim is padded
        for k in range(dense.nblocks):
            for d in range(n):
                if not dimmask[k, d]:
                    C[k, d, d] = -1.0
    # penalty variable: identity on real dims of every block
    for k in range(K):
        A[k, m] = np.diag(dimmask[k].astype(np.float64))

    p = dense.G.shape[0]
    if p == 0:
        G = np.zeros((1, mp))
        h = np.array([-1.0])  # trivially satisfied dummy row
    else:
        G = np.concatenate([dense.G, np.ones((p, 1))], axis=1)
        h = dense.h.copy()

    ndim_sdp = int(dimmask.sum())
    return IPMData(
        A=jnp.asarray(A, dtype),
        C=jnp.asarray(C, dtype),
        G=jnp.asarray(G, dtype),
        h=jnp.asarray(h, dtype),
        dimmask=jnp.asarray(dimmask),
        b_base=jnp.asarray(np.concatenate([dense.obj, [0.0]]), dtype),
        nvars=m,
        ndim_sdp=max(ndim_sdp, 1),
    )


class PresolveOut(NamedTuple):
    lb: jnp.ndarray        # (B, mp) tightened
    ub: jnp.ndarray
    fix: jnp.ndarray       # (B, mp) bool
    fixval: jnp.ndarray    # (B, mp)
    lbmask: jnp.ndarray    # (B, mp) finite-and-free lower bound rows
    ubmask: jnp.ndarray
    rowmask: jnp.ndarray   # (B, P) active rows (LP rows ++ cut rows)
    conflict: jnp.ndarray  # (B,) bool
    allfixed: jnp.ndarray  # (B,) bool
    fixed_feasible: jnp.ndarray  # (B,) bool (valid when allfixed)


def presolve(data: IPMData, Gall, hall, rowvalid, lb, ub, feastol, epsfix,
             rounds: int) -> PresolveOut:
    """Vectorized SDPI presolve (sdpi.c:3190-3275, prepareLPData:1131).

    Operates on the unified per-node row system ``Gall`` (B, P, mp) /
    ``hall`` (B, P): the problem's static LP rows broadcast over the batch
    followed by per-node cut rows (eigenvector cuts, rank-1 cuts, ...).
    """
    B = lb.shape[0]
    P = Gall.shape[1]
    Gnz = (Gall != 0)
    rowmask = rowvalid
    conflict = jnp.zeros((B,), dtype=bool)
    barange = jnp.arange(B)[:, None]

    for _ in range(rounds):
        fin_lb = lb > -INF_THRESH
        fin_ub = ub < INF_THRESH
        conflict = conflict | jnp.any(lb > ub + feastol, axis=1)
        fix = fin_lb & fin_ub & (ub - lb <= epsfix)
        fixval = jnp.where(fix, 0.5 * (lb + ub), 0.0)
        free = ~fix
        nfree = jnp.einsum("xpm,xm->xp", Gnz.astype(lb.dtype),
                           free.astype(lb.dtype))
        rowconst = jnp.einsum("xpm,xm->xp", Gall, fixval)
        # rows with all variables fixed: check & drop (sdpi.c bound conflicts)
        rows0 = rowmask & (nfree < 0.5)
        unsat = rows0 & (rowconst < hall - feastol)
        conflict = conflict | jnp.any(unsat, axis=1)
        rowmask = rowmask & ~rows0
        # rows with exactly one free variable -> bound (prepareLPData)
        rows1 = rowmask & (nfree > 0.5) & (nfree < 1.5)
        jstar = jnp.argmax(Gnz & free[:, None, :], axis=2)   # (B, P)
        g = jnp.take_along_axis(Gall, jstar[:, :, None], axis=2)[:, :, 0]
        newb = (hall - rowconst) / jnp.where(jnp.abs(g) > 0, g, 1.0)
        cand_lb = jnp.where(rows1 & (g > 0), newb, -jnp.inf)
        cand_ub = jnp.where(rows1 & (g < 0), newb, jnp.inf)
        lb = lb.at[barange, jstar].max(cand_lb)
        ub = ub.at[barange, jstar].min(cand_ub)
        rowmask = rowmask & ~rows1

    fin_lb = lb > -INF_THRESH
    fin_ub = ub < INF_THRESH
    conflict = conflict | jnp.any(lb > ub + feastol, axis=1)
    fix = fin_lb & fin_ub & (ub - lb <= epsfix)
    fixval = jnp.where(fix, 0.5 * (lb + ub), 0.0)
    free = ~fix
    allfixed = jnp.all(fix, axis=1)

    # all-fixed feasibility by eigenvalue check (checkFixedFeasibilitySdp)
    Zf = jnp.einsum("kjab,xj->xkab", data.A, fixval) - data.C[None]
    lam = min_eigenvalue(Zf, data.dimmask[None, :, :])       # (B, K)
    fixed_feasible = jnp.all(lam >= -feastol, axis=1)

    return PresolveOut(
        lb=lb,
        ub=ub,
        fix=fix,
        fixval=fixval,
        lbmask=fin_lb & free,
        ubmask=fin_ub & free,
        rowmask=rowmask,
        conflict=conflict,
        allfixed=allfixed,
        fixed_feasible=fixed_feasible,
    )


class IPMState(NamedTuple):
    y: jnp.ndarray     # (B, mp)
    X: jnp.ndarray     # (B, K, n, n)
    S: jnp.ndarray     # (B, K, n, n)
    xl: jnp.ndarray    # (B, P)
    sl: jnp.ndarray    # (B, P)
    xlb: jnp.ndarray   # (B, mp)
    slb: jnp.ndarray   # (B, mp)
    xub: jnp.ndarray   # (B, mp)
    sub: jnp.ndarray   # (B, mp)
    it: jnp.ndarray    # ()
    done: jnp.ndarray  # (B,)
    converged: jnp.ndarray  # (B,)
    failed: jnp.ndarray     # (B,)
    best_merit: jnp.ndarray  # (B,) best progress merit seen
    stall: jnp.ndarray       # (B,) iterations without progress


class SolveOutput(NamedTuple):
    status: jnp.ndarray     # (B,) int32 SolverResultStatus
    dobj: jnp.ndarray       # (B,) objective b^T y (incl. Gamma*r)
    y: jnp.ndarray          # (B, mp)
    r: jnp.ndarray          # (B,) penalty variable value
    gap: jnp.ndarray        # (B,) complementarity gap
    pinf: jnp.ndarray       # (B,) stationarity residual (scaled)
    dinf: jnp.ndarray       # (B,) constraint residual (scaled)
    iters: jnp.ndarray      # () iterations used by the batch
    X: jnp.ndarray          # (B, K, n, n) primal blocks
    xl: jnp.ndarray         # (B, P) row primal multipliers (LP ++ cuts)
    xlb: jnp.ndarray        # (B, mp) lower-bound multipliers (dual fixing!)
    xub: jnp.ndarray        # (B, mp) upper-bound multipliers


def ipm_solve(
    data: IPMData,
    b: jnp.ndarray,       # (B, mp) objective incl. penalty coefficient
    lb: jnp.ndarray,      # (B, mp)
    ub: jnp.ndarray,      # (B, mp)
    Gcut: jnp.ndarray = None,     # (B, q, mp) per-node cut rows  Gcut y >= hcut
    hcut: jnp.ndarray = None,     # (B, q)
    cutvalid: jnp.ndarray = None,  # (B, q) bool
    warm_y: jnp.ndarray = None,   # (B, mp) parent dual solution (warmstart)
    warm_mask: jnp.ndarray = None,  # (B,) bool: rows with valid warm_y
    *,
    settings: IPMSettings,
) -> SolveOutput:
    """Solve a batch of SDPs. All shapes static; call under jit."""
    dtype = jnp.float64 if settings.dtype == "float64" else jnp.float32
    b = b.astype(dtype)
    lb = lb.astype(dtype)
    ub = ub.astype(dtype)
    B, mp = b.shape
    K, _, n, _ = data.A.shape
    feastol = settings.feastol
    gaptol = settings.gaptol

    # unified per-node row system: static LP rows ++ per-node cuts
    Gs = jnp.broadcast_to(data.G[None], (B,) + data.G.shape)
    hs = jnp.broadcast_to(data.h[None], (B, data.G.shape[0]))
    valids = jnp.ones((B, data.G.shape[0]), dtype=bool)
    if Gcut is not None:
        Gall = jnp.concatenate([Gs, Gcut.astype(dtype)], axis=1)
        hall = jnp.concatenate([hs, hcut.astype(dtype)], axis=1)
        rowvalid = jnp.concatenate([valids, cutvalid], axis=1)
    else:
        Gall, hall, rowvalid = Gs, hs, valids
    P = Gall.shape[1]

    pre = presolve(data, Gall, hall, rowvalid, lb, ub, feastol,
                   settings.epsilon, settings.presolve_rounds)

    pad_diag = data.dimmask[None, :, :]                       # (1, K, n)
    pad_outer = pad_diag[..., :, None] & pad_diag[..., None, :]  # (1,K,n,n)
    eyen = jnp.eye(n, dtype=dtype)
    # identity restricted to active dims: diag(dimmask)
    eye_active = eyen[None, None] * pad_diag[..., None] * pad_diag[..., None, :]

    nu = (
        jnp.full((B,), float(data.ndim_sdp), dtype)
        + jnp.sum(pre.rowmask, axis=1)
        + jnp.sum(pre.lbmask, axis=1)
        + jnp.sum(pre.ubmask, axis=1)
    )
    nu = jnp.maximum(nu, 1.0)

    # ---- initial point ----------------------------------------------------
    two = pre.lbmask & pre.ubmask
    y0 = jnp.where(two, 0.5 * (pre.lb + pre.ub), 0.0)
    y0 = jnp.where(pre.lbmask & ~pre.ubmask, jnp.maximum(pre.lb + 1.0, 0.0), y0)
    y0 = jnp.where(pre.ubmask & ~pre.lbmask, jnp.minimum(pre.ub - 1.0, 0.0), y0)
    y0 = jnp.where(pre.fix, pre.fixval, y0)
    if warm_y is not None:
        # warmstart (relax_sdp.c determineWarmStartInformation semantics,
        # warmstartproject=2: project the parent solution into the child's
        # bounds with a strict-interior margin)
        span = jnp.where(two, pre.ub - pre.lb, 2.0)
        margin = 0.05 * span
        yw = jnp.clip(warm_y.astype(dtype),
                      jnp.where(pre.lbmask, pre.lb + margin, -jnp.inf),
                      jnp.where(pre.ubmask, pre.ub - margin, jnp.inf))
        wm = (warm_mask if warm_mask is not None
              else jnp.ones((B,), bool))[:, None]
        y0 = jnp.where(pre.fix, pre.fixval, jnp.where(wm, yw, y0))

    Z0 = jnp.einsum("kjab,xj->xkab", data.A, y0) - data.C[None]
    normb = jnp.max(jnp.abs(b), axis=1)
    # initial-point scale: exclude the penalty objective coefficient Gamma
    # (b[m]) — a large Gamma must not blow up X0/S0 (lambda* heuristic,
    # sdpisolver_sdpa.cpp lambdastar)
    normb_orig = jnp.max(jnp.abs(b[:, : data.nvars]), axis=1) if data.nvars > 0 \
        else jnp.zeros((B,), dtype)
    normZ0 = jnp.max(jnp.abs(jnp.where(pad_outer, Z0, 0.0)), axis=(1, 2, 3))
    normh = jnp.max(jnp.abs(jnp.where(pre.rowmask, hall, 0.0)), axis=1)
    scale = settings.init_point_scale * jnp.maximum(
        1.0, jnp.maximum(normb_orig, jnp.maximum(normZ0, normh))
    )  # (B,)
    xi = scale[:, None, None, None]
    X0 = xi * eyen[None, None] * jnp.ones((B, K, 1, 1), dtype)
    S0 = X0
    if warm_y is not None:
        # dual slack matrix from the projected parent point, floored on
        # the PSD cone and convex-combined with the scaled identity
        # (fillStartZ, relax_sdp.c:2649-2954; iptype=1 scaled identity,
        # factor = warmstartipfactor)
        f = settings.warmstartipfactor
        lamW, VW = jnp.linalg.eigh(
            jnp.where(pad_outer, Z0, eyen[None, None] * xi))
        lfloor = 1e-3 * jnp.maximum(1.0, jnp.max(jnp.abs(lamW), axis=-1,
                                                 keepdims=True))
        lamWp = jnp.maximum(lamW, lfloor)
        Zproj = jnp.einsum("xkae,xke,xkbe->xkab", VW, lamWp, VW)
        S0w = (1.0 - f) * jnp.where(pad_outer, Zproj,
                                    eyen[None, None] * xi) + f * X0
        wmk = (warm_mask if warm_mask is not None
               else jnp.ones((B,), bool))[:, None, None, None]
        S0 = sym(jnp.where(wmk, S0w, S0))
    sl0 = jnp.where(pre.rowmask,
                    jnp.maximum(jnp.einsum("xpm,xm->xp", Gall, y0) - hall,
                                scale[:, None]),
                    1.0)
    xl0 = jnp.where(pre.rowmask, scale[:, None], 0.0)
    slb0 = jnp.where(pre.lbmask, jnp.maximum(y0 - pre.lb, 1.0), 1.0)
    sub0 = jnp.where(pre.ubmask, jnp.maximum(pre.ub - y0, 1.0), 1.0)
    xlb0 = jnp.where(pre.lbmask, scale[:, None], 0.0)
    xub0 = jnp.where(pre.ubmask, scale[:, None], 0.0)

    done0 = pre.conflict | pre.allfixed
    st0 = IPMState(
        y=y0, X=X0, S=S0, xl=xl0, sl=sl0, xlb=xlb0, slb=slb0, xub=xub0,
        sub=sub0, it=jnp.asarray(0, jnp.int32), done=done0,
        converged=jnp.zeros((B,), bool), failed=jnp.zeros((B,), bool),
        best_merit=jnp.full((B,), jnp.inf, dtype),
        stall=jnp.zeros((B,), jnp.int32),
    )

    datascale = 1.0 + jnp.maximum(
        jnp.max(jnp.abs(data.C)), jnp.max(jnp.abs(data.h))
    )
    free_outer = (~pre.fix)[:, :, None] & (~pre.fix)[:, None, :]

    def residuals(st: IPMState):
        yh = jnp.where(pre.fix, pre.fixval, st.y)
        Z = jnp.einsum("kjab,xj->xkab", data.A, yh) - data.C[None]
        Rp = jnp.where(pad_outer, Z - st.S, 0.0)
        Gy = jnp.einsum("xpm,xm->xp", Gall, yh)
        rpl = jnp.where(pre.rowmask, Gy - hall - st.sl, 0.0)
        rplb = jnp.where(pre.lbmask, (yh - pre.lb) - st.slb, 0.0)
        rpub = jnp.where(pre.ubmask, (pre.ub - yh) - st.sub, 0.0)
        AstarX = jnp.einsum("kjab,xkba->xj", data.A, st.X)
        rd = (b - AstarX - jnp.einsum("xpm,xp->xm", Gall, st.xl)
              - st.xlb + st.xub)
        rd = jnp.where(pre.fix, 0.0, rd)
        return yh, Rp, rpl, rplb, rpub, rd

    def comp_gap(st: IPMState):
        XS = jnp.where(pad_outer, st.X * st.S, 0.0)  # <X,S> Frobenius (sym)
        return (
            jnp.sum(XS, axis=(1, 2, 3))
            + jnp.sum(jnp.where(pre.rowmask, st.xl * st.sl, 0.0), axis=1)
            + jnp.sum(jnp.where(pre.lbmask, st.xlb * st.slb, 0.0), axis=1)
            + jnp.sum(jnp.where(pre.ubmask, st.xub * st.sub, 0.0), axis=1)
        )

    def converged_mask(st: IPMState):
        yh, Rp, rpl, rplb, rpub, rd = residuals(st)
        gap = comp_gap(st)
        dobj = jnp.sum(b * yh, axis=1)
        # explicit primal (Lagrange-dual) objective of the reduced problem
        # with fixed variables folded into the constant data:
        #   pobj = <A_0eff, X> + h_eff.xl + l.xlb - u.xub + sum_fix b_j f_j
        CX = jnp.sum(jnp.where(pad_outer, data.C[None] * st.X, 0.0),
                     axis=(1, 2, 3))
        AstarX = jnp.einsum("kjab,xkba->xj", data.A, st.X)
        GTxl = jnp.einsum("xpm,xp->xm", Gall, st.xl)
        hxl = jnp.sum(jnp.where(pre.rowmask, hall * st.xl, 0.0), axis=1)
        lxlb = jnp.sum(jnp.where(pre.lbmask, pre.lb * st.xlb, 0.0), axis=1)
        uxub = jnp.sum(jnp.where(pre.ubmask, pre.ub * st.xub, 0.0), axis=1)
        fixcorr = jnp.sum(
            jnp.where(pre.fix, pre.fixval * (AstarX + GTxl - b), 0.0), axis=1
        )
        pobj = CX + hxl + lxlb - uxub - fixcorr
        pinf = jnp.max(jnp.abs(rd), axis=1) / (1.0 + normb)
        dinf = jnp.maximum(
            jnp.max(jnp.abs(Rp), axis=(1, 2, 3)),
            jnp.maximum(
                jnp.max(jnp.abs(rpl), axis=1),
                jnp.maximum(jnp.max(jnp.abs(rplb), axis=1),
                            jnp.max(jnp.abs(rpub), axis=1)),
            ),
        ) / datascale
        relgap = gap / (1.0 + jnp.abs(dobj))
        # strong-duality check: guards against spurious convergence when a
        # huge objective scale (e.g. penalty Gamma) makes the scaled
        # residual tolerances too lax (role of the reference's independent
        # sdpsolchecker re-verification, sdpsolchecker.c:58)
        dualgap = jnp.abs(dobj - pobj) / (
            1.0 + jnp.maximum(jnp.abs(dobj), jnp.abs(pobj))
        )
        conv = (
            (pinf <= feastol) & (dinf <= feastol)
            & (relgap <= gaptol) & (dualgap <= 10.0 * gaptol)
        )
        return conv, gap, pinf, dinf

    def cond(st: IPMState):
        return (st.it < settings.max_iters) & ~jnp.all(st.done)

    def body(st: IPMState) -> IPMState:
        yh, Rp, rpl, rplb, rpub, rd = residuals(st)
        gap = comp_gap(st)
        mu = gap / nu

        Lx = jnp.linalg.cholesky(st.X)
        Ls = jnp.linalg.cholesky(st.S)
        Sinv = spd_inverse(st.S, Ls)

        # Schur complement M_ij = sum_k tr(A_i X A_j S^{-1}) — the
        # reference hot loop (Schur assembly inside DSDP/SDPA per IPM
        # iteration).  Factorized form: with X = Lx Lx^T and
        # S^{-1} = Ls^{-T} Ls^{-1}, setting W_j = Lx^T A_j Ls^{-T} gives
        # M = sum_k <W_i, W_j>_F — exactly symmetric PSD and one big MXU
        # matmul over the flattened (mp, n^2) W.
        P = jnp.einsum("xkba,kjbc->xkjac", Lx, data.A)       # Lx^T A_j
        Lsb = jnp.broadcast_to(Ls[:, :, None], P.shape)
        Wt = jax.scipy.linalg.solve_triangular(
            Lsb, jnp.swapaxes(P, -1, -2), lower=True
        )                                                     # Ls^{-1} P^T
        # LP/cut rows contribute G^T diag(xl/sl) G = Wg^T Wg with
        # Wg = sqrt(xl/sl) * G; stack them into the same feature axis so
        # the whole Schur complement is ONE (mp, F) x (F, mp) MXU matmul
        wl = jnp.where(pre.rowmask, st.xl / st.sl, 0.0)
        Wg = jnp.sqrt(wl)[:, :, None] * Gall                 # (B, P, mp)
        Wall = jnp.concatenate(
            [jnp.transpose(Wt, (0, 2, 1, 3, 4)).reshape(B, mp, -1),
             jnp.swapaxes(Wg, 1, 2)], axis=2)                # (B, mp, F)
        M = _schur_product(Wall, settings)
        wlb = jnp.where(pre.lbmask, st.xlb / st.slb, 0.0)
        wub = jnp.where(pre.ubmask, st.xub / st.sub, 0.0)
        M = M + (wlb + wub)[:, :, None] * jnp.eye(mp, dtype=dtype)[None]
        # fixed variables: identity row/col, dy = 0
        M = jnp.where(free_outer, M, 0.0)
        M = M + (pre.fix.astype(dtype))[:, :, None] * jnp.eye(mp, dtype=dtype)[None]
        reg = settings.chol_reg * (1.0 + jnp.max(jnp.abs(M), axis=(1, 2)))
        M = M + reg[:, None, None] * jnp.eye(mp, dtype=dtype)[None]
        Lm = jnp.linalg.cholesky(M)

        def direction(Rc, rcl, rclb, rcub):
            Psi = Rc - jnp.einsum("xkab,xkbc->xkac", st.X, Rp)
            PsiSinv = jnp.einsum("xkab,xkbc->xkac", Psi, Sinv)
            rhs = (
                jnp.einsum("kjab,xkba->xj", data.A, PsiSinv)
                + jnp.einsum("xpm,xp->xm", Gall,
                             jnp.where(pre.rowmask,
                                       (rcl - st.xl * rpl) / st.sl, 0.0))
                + jnp.where(pre.lbmask, (rclb - st.xlb * rplb) / st.slb, 0.0)
                - jnp.where(pre.ubmask, (rcub - st.xub * rpub) / st.sub, 0.0)
                - rd
            )
            rhs = jnp.where(pre.fix, 0.0, rhs)
            dy = chol_solve(Lm, rhs)
            dS = jnp.where(
                pad_outer,
                jnp.einsum("kjab,xj->xkab", data.A, dy) + Rp,
                0.0,
            )
            dsl = jnp.where(pre.rowmask,
                            jnp.einsum("xpm,xm->xp", Gall, dy) + rpl, 0.0)
            dslb = jnp.where(pre.lbmask, dy + rplb, 0.0)
            dsub = jnp.where(pre.ubmask, -dy + rpub, 0.0)
            dX = jnp.einsum(
                "xkab,xkbc->xkac",
                Rc - jnp.einsum("xkab,xkbc->xkac", st.X, dS),
                Sinv,
            )
            dX = jnp.where(pad_outer, sym(dX), 0.0)
            dxl = jnp.where(pre.rowmask, (rcl - st.xl * dsl) / st.sl, 0.0)
            dxlb = jnp.where(pre.lbmask, (rclb - st.xlb * dslb) / st.slb, 0.0)
            dxub = jnp.where(pre.ubmask, (rcub - st.xub * dsub) / st.sub, 0.0)
            return dy, dX, dS, dxl, dsl, dxlb, dslb, dxub, dsub

        psd_step = (max_step_psd_power if settings.step_rule == "power"
                    else max_step_psd)

        def steplens(dX, dS, dxl, dsl, dxlb, dslb, dxub, dsub):
            ap = jnp.min(psd_step(Lx, dX), axis=1)
            ap = jnp.minimum(ap, max_step_pos(st.xl, dxl, pre.rowmask))
            ap = jnp.minimum(ap, max_step_pos(st.xlb, dxlb, pre.lbmask))
            ap = jnp.minimum(ap, max_step_pos(st.xub, dxub, pre.ubmask))
            ad = jnp.min(psd_step(Ls, dS), axis=1)
            ad = jnp.minimum(ad, max_step_pos(st.sl, dsl, pre.rowmask))
            ad = jnp.minimum(ad, max_step_pos(st.slb, dslb, pre.lbmask))
            ad = jnp.minimum(ad, max_step_pos(st.sub, dsub, pre.ubmask))
            return ap, ad

        XS = jnp.einsum("xkab,xkbc->xkac", st.X, st.S)
        # predictor (affine scaling)
        Rc_a = jnp.where(pad_outer, -XS, 0.0)
        rcl_a = jnp.where(pre.rowmask, -st.xl * st.sl, 0.0)
        rclb_a = jnp.where(pre.lbmask, -st.xlb * st.slb, 0.0)
        rcub_a = jnp.where(pre.ubmask, -st.xub * st.sub, 0.0)
        da = direction(Rc_a, rcl_a, rclb_a, rcub_a)
        dy_a, dX_a, dS_a, dxl_a, dsl_a, dxlb_a, dslb_a, dxub_a, dsub_a = da
        # the affine step lengths only feed Mehrotra's sigma estimate, so a
        # cheap conservative Gershgorin bound replaces the exact PSD
        # max-step (halves the eigendecompositions per iteration)
        def psd_step_cheap(L, dM):
            W = jax.scipy.linalg.solve_triangular(L, dM, lower=True)
            Y = jax.scipy.linalg.solve_triangular(
                L, jnp.swapaxes(W, -1, -2), lower=True)
            lam_bound = jnp.max(jnp.sum(jnp.abs(sym(Y)), axis=-1), axis=-1)
            return 1.0 / jnp.maximum(lam_bound, 1e-300)

        ap_a = jnp.min(psd_step_cheap(Lx, dX_a), axis=1)
        ap_a = jnp.minimum(ap_a, max_step_pos(st.xl, dxl_a, pre.rowmask))
        ap_a = jnp.minimum(ap_a, max_step_pos(st.xlb, dxlb_a, pre.lbmask))
        ap_a = jnp.minimum(ap_a, max_step_pos(st.xub, dxub_a, pre.ubmask))
        ad_a = jnp.min(psd_step_cheap(Ls, dS_a), axis=1)
        ad_a = jnp.minimum(ad_a, max_step_pos(st.sl, dsl_a, pre.rowmask))
        ad_a = jnp.minimum(ad_a, max_step_pos(st.slb, dslb_a, pre.lbmask))
        ad_a = jnp.minimum(ad_a, max_step_pos(st.sub, dsub_a, pre.ubmask))
        ap_a = jnp.minimum(ap_a, 1.0)
        ad_a = jnp.minimum(ad_a, 1.0)

        # Mehrotra centering parameter
        Xa = st.X + ap_a[:, None, None, None] * dX_a
        Sa = st.S + ad_a[:, None, None, None] * dS_a
        gap_a = (
            jnp.sum(jnp.where(pad_outer, Xa * Sa, 0.0), axis=(1, 2, 3))
            + jnp.sum(jnp.where(pre.rowmask,
                                (st.xl + ap_a[:, None] * dxl_a)
                                * (st.sl + ad_a[:, None] * dsl_a), 0.0), axis=1)
            + jnp.sum(jnp.where(pre.lbmask,
                                (st.xlb + ap_a[:, None] * dxlb_a)
                                * (st.slb + ad_a[:, None] * dslb_a), 0.0), axis=1)
            + jnp.sum(jnp.where(pre.ubmask,
                                (st.xub + ap_a[:, None] * dxub_a)
                                * (st.sub + ad_a[:, None] * dsub_a), 0.0), axis=1)
        )
        sigma = jnp.clip((jnp.maximum(gap_a, 0.0) / jnp.maximum(gap, 1e-300)) ** 3,
                         settings.sigma_min, 1.0)

        # corrector
        smu = (sigma * mu)[:, None, None, None]
        Rc_c = jnp.where(
            pad_outer,
            smu * eye_active - XS
            - jnp.einsum("xkab,xkbc->xkac", dX_a, dS_a),
            0.0,
        )
        rcl_c = jnp.where(pre.rowmask,
                          sigma[:, None] * mu[:, None] - st.xl * st.sl
                          - dxl_a * dsl_a, 0.0)
        rclb_c = jnp.where(pre.lbmask,
                           sigma[:, None] * mu[:, None] - st.xlb * st.slb
                           - dxlb_a * dslb_a, 0.0)
        rcub_c = jnp.where(pre.ubmask,
                           sigma[:, None] * mu[:, None] - st.xub * st.sub
                           - dxub_a * dsub_a, 0.0)
        dc = direction(Rc_c, rcl_c, rclb_c, rcub_c)
        dy, dX, dS, dxl, dsl, dxlb, dslb, dxub, dsub = dc
        ap, ad = steplens(dX, dS, dxl, dsl, dxlb, dslb, dxub, dsub)
        ap = jnp.minimum(settings.tau * ap, 1.0)
        ad = jnp.minimum(settings.tau * ad, 1.0)

        if settings.step_rule == "power":
            # the power estimate can overshoot the PSD boundary: probe the
            # stepped matrices with a Cholesky and shrink offending steps
            for _ in range(2):
                okx = ~jnp.any(jnp.isnan(jnp.linalg.cholesky(
                    st.X + ap[:, None, None, None] * dX)), axis=(1, 2, 3))
                oks = ~jnp.any(jnp.isnan(jnp.linalg.cholesky(
                    st.S + ad[:, None, None, None] * dS)), axis=(1, 2, 3))
                ap = jnp.where(okx, ap, 0.4 * ap)
                ad = jnp.where(oks, ad, 0.4 * ad)

        # freeze finished instances; detect numerical failure (NaN)
        bad = (
            jnp.any(jnp.isnan(dy), axis=1)
            | jnp.any(jnp.isnan(dX), axis=(1, 2, 3))
            | jnp.isnan(ap) | jnp.isnan(ad)
        )
        failed = st.failed | (bad & ~st.done)
        act = (~st.done) & ~bad
        ap = jnp.where(act, ap, 0.0)
        ad = jnp.where(act, ad, 0.0)

        new = IPMState(
            y=st.y + ad[:, None] * dy,
            X=st.X + ap[:, None, None, None] * dX,
            S=st.S + ad[:, None, None, None] * dS,
            xl=st.xl + ap[:, None] * dxl,
            sl=st.sl + ad[:, None] * dsl,
            xlb=st.xlb + ap[:, None] * dxlb,
            slb=st.slb + ad[:, None] * dslb,
            xub=st.xub + ap[:, None] * dxub,
            sub=st.sub + ad[:, None] * dsub,
            it=st.it + 1,
            done=st.done,
            converged=st.converged,
            failed=failed,
            best_merit=st.best_merit,
            stall=st.stall,
        )
        conv, gap_n, pinf_n, dinf_n = converged_mask(new)
        # stall detection: instances making no progress burn the whole
        # batch's wall clock (the while_loop runs until ALL are done) —
        # declare them failed early and let the recovery ladder handle them
        merit = gap_n / (1.0 + jnp.abs(jnp.sum(b * new.y, axis=1))) \
            + pinf_n + dinf_n
        improved = merit < 0.8 * new.best_merit
        best_merit = jnp.where(improved, merit, new.best_merit)
        stall_cnt = jnp.where(improved | new.done, 0, new.stall + 1)
        stalled = stall_cnt >= 15
        failed2 = new.failed | (stalled & ~new.done & ~conv)
        newly_conv = conv & ~new.done & ~failed2
        return new._replace(
            converged=new.converged | newly_conv,
            done=new.done | newly_conv | failed2,
            failed=failed2,
            best_merit=best_merit,
            stall=stall_cnt,
        )

    st = jax.lax.while_loop(cond, body, st0)

    conv, gap, pinf, dinf = converged_mask(st)
    converged = st.converged | (conv & ~pre.conflict & ~pre.allfixed)
    yh = jnp.where(pre.fix, pre.fixval, st.y)
    dobj = jnp.sum(b * yh, axis=1)
    dobj = jnp.where(pre.allfixed & pre.fixed_feasible,
                     jnp.sum(b * pre.fixval, axis=1), dobj)

    status = jnp.full((B,), int(SolverResultStatus.FAILED), jnp.int32)
    status = jnp.where(converged, int(SolverResultStatus.OPTIMAL), status)
    status = jnp.where(
        pre.allfixed & ~pre.conflict,
        jnp.where(pre.fixed_feasible,
                  int(SolverResultStatus.PRESOLVED_OPTIMAL),
                  int(SolverResultStatus.PRESOLVED_INFEASIBLE)),
        status,
    )
    status = jnp.where(pre.conflict,
                       int(SolverResultStatus.PRESOLVED_INFEASIBLE), status)

    return SolveOutput(
        status=status,
        dobj=dobj,
        y=yh,
        r=yh[:, data.nvars],
        gap=gap,
        pinf=pinf,
        dinf=dinf,
        iters=st.it,
        X=st.X,
        xl=st.xl,
        xlb=st.xlb,
        xub=st.xub,
    )
