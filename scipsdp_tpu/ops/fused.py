"""Fused Newton-direction kernels for the refine IPM tier.

The refine tier's direction solve (ops/ipm.py iter_products_refine) is
~30 separate device ops per call — compensated contractions, f32
preconditioned back-solves, f64 recoveries.  At IPM block sizes the
per-kernel fixed cost (not FLOPs) dominates the iteration, so this
module fuses the chain into three Mosaic kernels per direction and
bucket:

  K1  rhs assembly: PsiSinv = (Rc - X Rp) S^{-1} and its A*-contraction
      into the Schur right-hand side
  K2  Schur solve: f32 Minv preconditioner + ``schur_refine`` passes of
      exact-residual refinement against the f32 feature Gram
  K3  recovery: dS = A(dy) + Rp,  dX = (Rc - X dS) S^{-1}
      (symmetrization happens outside — Mosaic-side transposes avoided)

All f64 quantities travel as double-single (hi, lo) f32 pairs using the
error-free transforms from ops/df32.py (Mosaic has no f64).  Everything
is batched over the node batch INSIDE each kernel — TPU cores run grid
cells sequentially, so per-instance grids would serialize the batch.
The A*-contraction and A-application exploit the SYMMETRY of the
constraint matrices (einsum('kjab,xkba->xj') == an elementwise
contraction when A_j = A_j^T), so no in-kernel transposes are needed.

Reference role: one Newton direction of the HKM predictor-corrector
(the per-iteration core the back-ends spend their time in, e.g.
sdpisolver_dsdp.c's DSDP iteration); re-architected for a TPU where
kernel-launch count, not arithmetic, is the budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scipsdp_tpu.ops.df32 import _dd_mac, _two_prod, _two_sum

_INTERPRET = False


def _use_interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# double-single helpers (batched; reductions slice in place — no moveaxis)
# ---------------------------------------------------------------------------


def _dd_add(ah, al, bh, bl):
    s, e = _two_sum(ah, bh)
    t = e + (al + bl)
    return _two_sum(s, t)


def _dd_sub(ah, al, bh, bl):
    return _dd_add(ah, al, -bh, -bl)


def _dd_mul(ah, al, bh, bl):
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return _two_sum(p, e)


def _halve_lead(v):
    """Plain halving-tree sum over the LEADING axis (Mosaic-safe: leading
    slices need no relayout; trailing-axis slices and even multi-axis
    vector reductions hit "Not implemented: Offset change")."""
    n = v.shape[0]
    while n > 1:
        h = n // 2
        s = v[:h] + v[h:2 * h]
        if n % 2:
            v = jnp.concatenate([s, v[2 * h:n]], axis=0)
            n = h + 1
        else:
            v = s
            n = h
    return v[0]


def _halve_lead_keep(v):
    """Like _halve_lead but keeps the (1, ...) leading axis (no rank
    change — Mosaic rejects 1D<->ND shape casts)."""
    n = v.shape[0]
    while n > 1:
        h = n // 2
        s = v[:h] + v[h:2 * h]
        if n % 2:
            v = jnp.concatenate([s, v[2 * h:n]], axis=0)
            n = h + 1
        else:
            v = s
            n = h
    return v


def _reduce_cols_keep(x):
    """(B, K) -> (B, 1) sum via a 2D transpose + leading halving tree
    (rank-preserving; lane-axis vector reductions are unsupported)."""
    v = jnp.swapaxes(x, 0, 1)            # (K, B)
    return jnp.swapaxes(_halve_lead_keep(v), 0, 1)   # (B, 1)


def _dd_reduce_cols_keep(xh, xl):
    """Compensated (B, K) pair -> (B, 1) pair: TwoSum halving tree on the
    hi parts over the transposed leading axis, errors folded into lo."""
    vh = jnp.swapaxes(xh, 0, 1)          # (K, B)
    vl = jnp.swapaxes(xl, 0, 1)
    n = vh.shape[0]
    while n > 1:
        h = n // 2
        sh, e = _two_sum(vh[:h], vh[h:2 * h])
        sl = vl[:h] + vl[h:2 * h] + e
        if n % 2:
            vh = jnp.concatenate([sh, vh[2 * h:n]], axis=0)
            vl = jnp.concatenate([sl, vl[2 * h:n]], axis=0)
            n = h + 1
        else:
            vh, vl = sh, sl
            n = h
    return jnp.swapaxes(vh, 0, 1), jnp.swapaxes(vl, 0, 1)


def _dd_reduce_ax(ph, pe, axis):
    """Compensated reduction of product pairs along ``axis``: moveaxis to
    the leading position, TwoSum halving tree on the hi parts (errors
    collected in plain f32 — they are O(eps * |terms|))."""
    err = _halve_lead(jnp.moveaxis(pe, axis, 0))
    vals = jnp.moveaxis(ph, axis, 0)
    n = vals.shape[0]
    while n > 1:
        half = n // 2
        s, e = _two_sum(vals[:half], vals[half:2 * half])
        err = err + _halve_lead(e)
        if n % 2:
            vals = jnp.concatenate([s, vals[2 * half:n]], axis=0)
            n = half + 1
        else:
            vals = s
            n = half
    return vals[0], err


def _bmm_math_batched(ah, al, bh, bl):
    """(..., n, n) @ (..., n, n) double-single matmul, batched over the
    leading axes.  fori over the contraction index with iota masks
    (Mosaic TC has no dynamic_slice); each step is one compensated
    rank-1 MAC over the whole batch."""
    n = ah.shape[-1]
    nd = ah.ndim
    sh0 = jnp.zeros_like(ah)
    sl0 = jnp.zeros_like(ah)
    shp = (1,) * (nd - 2) + (n, n)
    cols = jax.lax.broadcasted_iota(jnp.int32, shp, nd - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, shp, nd - 2)

    def body(c, carry):
        sh, sl = carry
        cm = cols == c
        rm = rows == c
        avh = jnp.sum(jnp.where(cm, ah, 0.0), axis=nd - 1, keepdims=True)
        avl = jnp.sum(jnp.where(cm, al, 0.0), axis=nd - 1, keepdims=True)
        bvh = jnp.sum(jnp.where(rm, bh, 0.0), axis=nd - 2, keepdims=True)
        bvl = jnp.sum(jnp.where(rm, bl, 0.0), axis=nd - 2, keepdims=True)
        return _dd_mac(sh, sl, avh, avl, bvh, bvl)

    return jax.lax.fori_loop(0, n, body, (sh0, sl0))


def _bmm_math_f32b(ah, al, b32):
    """(..., n, n) dd-pair @ (..., n, n) plain-f32 (lo = 0)."""
    return _bmm_math_batched(ah, al, b32, jnp.zeros_like(b32))


# ---------------------------------------------------------------------------
# K1: rhs assembly (per bucket, K blocks as an explicit axis)
# ---------------------------------------------------------------------------


def _rhs_math(Afh, Afl, Rch, Rcl, XRph, XRpl, Sinv):
    """Pure math of the K1 kernel (eagerly testable; see tests/test_df32
    on why CPU jit cannot validate error-free transforms)."""
    K, mp = Afh.shape[0], Afh.shape[1]
    dh, dl = _dd_sub(Rch, Rcl, XRph, XRpl)
    Ph, Plo = _bmm_math_f32b(dh, dl, Sinv)          # (B, K, n, n)
    B = Ph.shape[0]
    # rhs[b, j] = sum_{k,a,c} A[k,j,a,c] * PsiSinv[b,k,a,c]  (A symmetric)
    jmask = jax.lax.broadcasted_iota(jnp.int32, (1, mp, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    oh0 = jnp.zeros((B, mp), jnp.float32)
    ol0 = jnp.zeros((B, mp), jnp.float32)

    def body(j, carry):
        oh, ol = carry
        jm = jmask == j
        Ajh = _halve_lead(jnp.moveaxis(
            jnp.where(jm, Afh, 0.0), 1, 0))[None]             # (1,K,n,n)
        Ajl = _halve_lead(jnp.moveaxis(
            jnp.where(jm, Afl, 0.0), 1, 0))[None]
        ph, pe = _two_prod(Ajh, Ph)
        pe = pe + (Ajh * Plo + Ajl * Ph)
        sh, se = _dd_reduce_ax(ph, pe, axis=3)      # (B, K, n)
        sh, se2 = _dd_reduce_ax(sh, se, axis=2)     # (B, K)
        shc, sec = _dd_reduce_cols_keep(sh, se2)    # (B, 1) pair
        cm = col == j
        oh, e1 = _two_sum(oh, jnp.where(cm, shc, 0.0))
        ol = ol + e1 + jnp.where(cm, sec, 0.0)
        return oh, ol

    return jax.lax.fori_loop(0, mp, body, (oh0, ol0))


def _rhs_kernel(Afh_ref, Afl_ref, Rch_ref, Rcl_ref, XRph_ref, XRpl_ref,
                Sinv_ref, outh_ref, outl_ref):
    oh, ol = _rhs_math(Afh_ref[:], Afl_ref[:], Rch_ref[:], Rcl_ref[:],
                       XRph_ref[:], XRpl_ref[:], Sinv_ref[:])
    outh_ref[:] = oh
    outl_ref[:] = ol


def rhs_bucket(A_pair, Rc_pair, XRp_pair, Sinv32):
    """A*-contraction of PsiSinv = (Rc - X Rp) S^{-1} for one bucket.

    A_pair: (K, mp, n, n) hi/lo (SYMMETRIC matrices); Rc/XRp:
    (B, K, n, n) pairs; Sinv32 (B, K, n, n) f32.  Returns the (B, mp)
    rhs contribution as an hi/lo pair."""
    Afh, Afl = A_pair
    Rch, Rcl = Rc_pair
    B, K, n, _ = Rch.shape
    mp = Afh.shape[1]
    mat = pl.BlockSpec(memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            _rhs_kernel,
            in_specs=[mat] * 7,
            out_specs=[mat] * 2,
            out_shape=[jax.ShapeDtypeStruct((B, mp), jnp.float32)] * 2,
            interpret=_use_interpret(),
        )(Afh, Afl, Rch, Rcl, XRp_pair[0], XRp_pair[1], Sinv32)
    return oh, ol


# ---------------------------------------------------------------------------
# K2: fused Schur solve (precondition + refine passes)
# ---------------------------------------------------------------------------


def _schur_math(nrefine, Wh, rhsh0, rhsl0, Minv, dsch, dscl, diagh,
                diagl, regh, regl, fix32):
    """Pure math of the K2 kernel."""
    live = 1.0 - fix32                               # (B, mp) 0/1
    rhsh = rhsh0 * live
    rhsl = rhsl0 * live

    def precond(rh, rl):
        vh, _ = _dd_mul(dsch, dscl, rh, rl)          # f32 rounding is fine
        u = _halve_lead(jnp.moveaxis(
            Minv * vh[:, None, :], 2, 0))            # (B, mp) f32 matvec
        return _dd_mul(dsch, dscl, u, jnp.zeros_like(u))

    dyh, dyl = precond(rhsh, rhsl)

    def pass_fn(_, carry):
        dyh, dyl = carry
        vfh = dyh * live
        vfl = dyl * live
        # u = W (W^T vf) + diag vf + reg vf, all compensated
        ph, pe = _two_prod(Wh, vfh[:, :, None])
        pe = pe + Wh * vfl[:, :, None]
        wth, wtl = _dd_reduce_ax(ph, pe, axis=1)     # (B, F)
        ph, pe = _two_prod(Wh, wth[:, None, :])
        pe = pe + Wh * wtl[:, None, :]
        uh, ul = _dd_reduce_ax(ph, pe, axis=2)       # (B, mp)
        t1h, t1l = _dd_mul(diagh, diagl, vfh, vfl)
        t2h, t2l = _dd_mul(regh, regl, vfh, vfl)
        uh, ul = _dd_add(uh, ul, t1h, t1l)
        uh, ul = _dd_add(uh, ul, t2h, t2l)
        rh, rl = _dd_sub(rhsh, rhsl, uh * live, ul * live)
        ch, cl = precond(rh, rl)
        return _dd_add(dyh, dyl, ch, cl)

    dyh, dyl = jax.lax.fori_loop(0, nrefine, pass_fn, (dyh, dyl))
    return dyh * live, dyl * live


def _schur_kernel(nrefine, Wh_ref, rhsh_ref, rhsl_ref, Minv_ref, dsch_ref,
                  dscl_ref, diagh_ref, diagl_ref, regh_ref, regl_ref,
                  fix_ref, dyh_ref, dyl_ref):
    dyh, dyl = _schur_math(nrefine, Wh_ref[:], rhsh_ref[:], rhsl_ref[:],
                           Minv_ref[:], dsch_ref[:], dscl_ref[:],
                           diagh_ref[:], diagl_ref[:], regh_ref[:],
                           regl_ref[:], fix_ref[:])
    dyh_ref[:] = dyh
    dyl_ref[:] = dyl


def schur_solve_fused(Wall32, rhs_pair, Minv32, dsc_pair, diag_pair,
                      reg_pair, fix, nrefine: int):
    """dy = (M + reg I)^{-1} rhs to f64 accuracy in ONE kernel:
    equilibrated-f32-factor preconditioning + ``nrefine`` exact-residual
    passes against the f32 feature Gram (Wall32) — the schur_solve of
    ops/ipm.py's refine tier without its ~12 separate launches.
    Returns the (B, mp) dy hi/lo pair."""
    B, mp, F = Wall32.shape
    mat = pl.BlockSpec(memory_space=pltpu.VMEM)
    fix32 = fix.astype(jnp.float32)
    kern = functools.partial(_schur_kernel, int(nrefine))
    with jax.enable_x64(False):
        dyh, dyl = pl.pallas_call(
            kern,
            in_specs=[mat] * 11,
            out_specs=[mat] * 2,
            out_shape=[jax.ShapeDtypeStruct((B, mp), jnp.float32)] * 2,
            interpret=_use_interpret(),
        )(Wall32, rhs_pair[0], rhs_pair[1], Minv32, dsc_pair[0],
          dsc_pair[1], diag_pair[0], diag_pair[1], reg_pair[0],
          reg_pair[1], fix32)
    return dyh, dyl


# ---------------------------------------------------------------------------
# K3: dS / dX recovery (per bucket)
# ---------------------------------------------------------------------------


def _recover_math(Afh, Afl, dyh, dyl, Rph, Rpl, Rch, Rcl, Xh, Xl, Sinv,
                  pad):
    """Pure math of the K3 kernel.  ``dyh``/``dyl`` arrive pre-shaped
    (B, mp, 1, 1) so the per-j scalar selection stays rank-4 throughout
    (Mosaic rejects 1D<->ND shape casts)."""
    K, mp, n, _ = Afh.shape
    B = dyh.shape[0]
    jmask = jax.lax.broadcasted_iota(jnp.int32, (1, mp, 1, 1), 1)
    sh0 = jnp.zeros((B, K, n, n), jnp.float32)
    sl0 = jnp.zeros((B, K, n, n), jnp.float32)

    def body(j, carry):
        sh, sl = carry
        jm = jmask == j
        Ajh = _halve_lead(jnp.moveaxis(
            jnp.where(jm, Afh, 0.0), 1, 0))[None]              # (1,K,n,n)
        Ajl = _halve_lead(jnp.moveaxis(
            jnp.where(jm, Afl, 0.0), 1, 0))[None]
        dh = _halve_lead(jnp.moveaxis(
            jnp.where(jm, dyh, 0.0), 1, 0))[:, None]           # (B,1,1,1)
        dl = _halve_lead(jnp.moveaxis(
            jnp.where(jm, dyl, 0.0), 1, 0))[:, None]
        return _dd_mac(sh, sl, Ajh, Ajl, dh, dl)

    dSh, dSl = jax.lax.fori_loop(0, mp, body, (sh0, sl0))
    dSh, dSl = _dd_add(dSh, dSl, Rph, Rpl)
    dSh = dSh * pad
    dSl = dSl * pad
    # dX_raw = (Rc - X dS) Sinv; symmetrization happens outside
    XdSh, XdSl = _bmm_math_batched(Xh, Xl, dSh, dSl)
    th, tl = _dd_sub(Rch, Rcl, XdSh, XdSl)
    dXh, dXl = _bmm_math_f32b(th, tl, Sinv)
    return dSh, dSl, dXh * pad, dXl * pad


def _recover_kernel(Afh_ref, Afl_ref, dyh_ref, dyl_ref, Rph_ref, Rpl_ref,
                    Rch_ref, Rcl_ref, Xh_ref, Xl_ref, Sinv_ref, pad_ref,
                    dSh_ref, dSl_ref, dXh_ref, dXl_ref):
    dSh, dSl, dXh, dXl = _recover_math(
        Afh_ref[:], Afl_ref[:], dyh_ref[:], dyl_ref[:], Rph_ref[:],
        Rpl_ref[:], Rch_ref[:], Rcl_ref[:], Xh_ref[:], Xl_ref[:],
        Sinv_ref[:], pad_ref[:])
    dSh_ref[:] = dSh
    dSl_ref[:] = dSl
    dXh_ref[:] = dXh
    dXl_ref[:] = dXl


def recover_bucket(A_pair, dy_pair, Rp_pair, Rc_pair, X_pair, Sinv32,
                   pad_outer):
    """dS = A(dy) + Rp and dX_raw = (Rc - X dS) S^{-1} in one kernel.

    Returns ((B, K, n, n) dS pair, (B, K, n, n) UNsymmetrized dX pair);
    the caller applies sym() after joining to f64."""
    Afh, Afl = A_pair
    B, K, n, _ = Rp_pair[0].shape
    mp = Afh.shape[1]
    mat = pl.BlockSpec(memory_space=pltpu.VMEM)
    pad32 = pad_outer.astype(jnp.float32)
    if pad32.ndim == 3:                              # (1|B, K, n, n) guard
        pad32 = pad32[None]
    pad32 = jnp.broadcast_to(pad32, (B, K, n, n)) + 0.0
    dyh4 = dy_pair[0].reshape(B, mp, 1, 1)
    dyl4 = dy_pair[1].reshape(B, mp, 1, 1)
    with jax.enable_x64(False):
        dSh, dSl, dXh, dXl = pl.pallas_call(
            _recover_kernel,
            in_specs=[mat] * 12,
            out_specs=[mat] * 4,
            out_shape=[jax.ShapeDtypeStruct((B, K, n, n), jnp.float32)] * 4,
            interpret=_use_interpret(),
        )(Afh, Afl, dyh4, dyl4, Rp_pair[0], Rp_pair[1],
          Rc_pair[0], Rc_pair[1], X_pair[0], X_pair[1], Sinv32, pad32)
    return (dSh, dSl), (dXh, dXl)
