"""Double-single (two-float32) compensated contraction kernels.

TPU Mosaic has no f64; XLA emulates every f64 contraction as a long chain
of small kernels (~0.4 ms fixed cost each on v5e, measured round 3).  The
"refine" IPM tier needs ~27 such contractions per iteration ONLY because
its Newton assembly cancels large near-equal products — the arithmetic
that matters is error-free products and exact accumulation, not the f64
format.  These kernels compute C = A @ B where every scalar MAC uses
Dekker/Veltkamp TwoProd + branch-free TwoSum on float32 pairs
(hi + lo, |lo| <= eps*|hi|), giving ~2^-45 relative accuracy in ONE
Mosaic kernel per contraction.

Reference role: the dense linear algebra the back-ends get from f64
LAPACK/BLAS (src/sdpi/lapack_interface.c) at the accuracies the IPM
endgame needs — re-derived for a TPU that only has f32 lanes.

All kernels are traced inside ``jax.enable_x64(False)`` (Mosaic rejects
x64-traced programs, see ops/pallas_kernels.py) and take/return f32
hi/lo pairs; `split64`/`join64` convert at the f64 boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # set True (tests) to run kernels in interpreter mode


def _use_interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# error-free transforms (branch-free, VPU-friendly)
# ---------------------------------------------------------------------------

_SPLIT = 4097.0   # 2^12 + 1: Veltkamp split constant for float32


def _split(a):
    t = a * _SPLIT
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """p + e == a*b exactly (f32)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _two_sum(a, b):
    """s + e == a + b exactly (f32)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _dd_mac(sh, sl, ah, al, bh, bl):
    """(sh, sl) += (ah+al) * (bh+bl); drops the O(eps^2) alo*blo term."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    sh, e2 = _two_sum(sh, p)
    return sh, sl + (e + e2)


def _dd_reduce(ph, pe, axis):
    """Compensated reduction of product pairs along ``axis``: TwoSum
    halving tree on the hi parts (errors collected in plain f32 — they
    are O(eps * |terms|), so their plain sum is accurate enough)."""
    err = jnp.sum(pe, axis=axis)
    vals = jnp.moveaxis(ph, axis, 0)
    n = vals.shape[0]
    while n > 1:
        half = n // 2
        a = vals[:half]
        b = vals[half: 2 * half]
        s, e = _two_sum(a, b)
        err = err + jnp.sum(e, axis=0)
        if n % 2:
            vals = jnp.concatenate([s, vals[2 * half: n]], axis=0)
            n = half + 1
        else:
            vals = s
            n = half
    return vals[0], err


# ---------------------------------------------------------------------------
# f64 boundary helpers
# ---------------------------------------------------------------------------

def split64(x):
    """f64 array -> (hi, lo) f32 pair with x == hi + lo (up to f64 eps)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def join64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _bmm_math(ah, al, bh, bl):
    """(n, n) @ (n, n) double-single matmul (pure math, kernel-shared).

    Column/row selection via iota masks — Mosaic TC has no dynamic_slice
    (same technique as ops/pallas_kernels.py's one-hot Cholesky); masked
    sums are exact, so the error-free transforms are unaffected."""
    n = ah.shape[-1]
    sh0 = jnp.zeros_like(ah)
    sl0 = jnp.zeros_like(ah)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)

    def body(c, carry):
        sh, sl = carry
        cm = cols == c
        rm = rows == c
        avh = jnp.sum(jnp.where(cm, ah, 0.0), axis=1, keepdims=True)
        avl = jnp.sum(jnp.where(cm, al, 0.0), axis=1, keepdims=True)
        bvh = jnp.sum(jnp.where(rm, bh, 0.0), axis=0, keepdims=True)
        bvl = jnp.sum(jnp.where(rm, bl, 0.0), axis=0, keepdims=True)
        return _dd_mac(sh, sl, avh, avl, bvh, bvl)

    return jax.lax.fori_loop(0, n, body, (sh0, sl0))


def _bmm_kernel(ah_ref, al_ref, bh_ref, bl_ref, ch_ref, cl_ref):
    """One (n, n) @ (n, n) double-single matmul per grid cell."""
    sh, sl = _bmm_math(ah_ref[0], al_ref[0], bh_ref[0], bl_ref[0])
    ch_ref[0] = sh
    cl_ref[0] = sl


@functools.partial(jax.jit, static_argnames=())
def dd_bmm(Ah, Al, Bh, Bl):
    """Batched square double-single matmul: (G, n, n) @ (G, n, n).

    Returns (Chi, Clo) f32 pairs with C accurate to ~2^-45 relative."""
    G, n, _ = Ah.shape
    spec = pl.BlockSpec((1, n, n), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _bmm_kernel,
            grid=(G,),
            in_specs=[spec, spec, spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((G, n, n), jnp.float32)] * 2,
            interpret=_use_interpret(),
        )(Ah, Al, Bh, Bl)


def _bmm_lanes_kernel(n_live, ah_ref, al_ref, bh_ref, bl_ref,
                      ch_ref, cl_ref):
    """Lanes-batched double-single matmul: refs are (n, n, L) with the
    matrix index on the 128-lane axis.  One rank-1 dd-MAC per step over
    the shared contraction index — all 128 matrices advance together
    (the per-matrix grid variant costs ~5 us/matrix at n=43; this one
    ~0.05 us/matrix, same arithmetic)."""
    n = ah_ref.shape[0]
    # accumulate IN the output refs (a loop-carried pair would cost two
    # more full-size VMEM buffers; 8 buffers OOM'd the 16 MB scoped stack
    # at n_p = 72)
    ch_ref[:] = jnp.zeros(ah_ref.shape, jnp.float32)
    cl_ref[:] = jnp.zeros(ah_ref.shape, jnp.float32)

    def body(c, carry):
        avh = ah_ref[:, pl.ds(c, 1), :]          # (n, 1, L)
        avl = al_ref[:, pl.ds(c, 1), :]
        bvh = bh_ref[pl.ds(c, 1), :, :]          # (1, n, L)
        bvl = bl_ref[pl.ds(c, 1), :, :]
        sh, sl = _dd_mac(ch_ref[:], cl_ref[:], avh, avl, bvh, bvl)
        ch_ref[:] = sh
        cl_ref[:] = sl
        return carry

    jax.lax.fori_loop(0, n_live, body, 0)


_LANES = 128


def _dd_bmm_lanes(Ah, Al, Bh, Bl):
    """(G, n, n) dd matmul via the lanes kernel (zero padding is inert
    in a matmul)."""
    G, n, _ = Ah.shape
    n_p = ((max(n, 8) + 7) // 8) * 8
    G_p = ((max(G, _LANES) + _LANES - 1) // _LANES) * _LANES

    def prep(X):
        Xt = jnp.transpose(X, (1, 2, 0))
        out = jnp.zeros((n_p, n_p, G_p), jnp.float32)
        return out.at[:n, :n, :G].set(Xt)

    spec = pl.BlockSpec((n_p, n_p, _LANES), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        Ch, Cl = pl.pallas_call(
            functools.partial(_bmm_lanes_kernel, n),
            grid=(G_p // _LANES,),
            in_specs=[spec] * 4,
            out_specs=[spec] * 2,
            out_shape=[jax.ShapeDtypeStruct((n_p, n_p, G_p),
                                            jnp.float32)] * 2,
            interpret=_use_interpret(),
        )(prep(Ah), prep(Al), prep(Bh), prep(Bl))
    return (jnp.transpose(Ch[:n, :n, :G], (2, 0, 1)),
            jnp.transpose(Cl[:n, :n, :G], (2, 0, 1)))


def _short_math(mh, ml, vh, vl):
    """sum_j M[j, :] * v[0, j] with M (J, F), v (1, J) -> (1, F) pair.

    Row/element selection via iota masks (no dynamic_slice on Mosaic)."""
    J, F = mh.shape
    sh0 = jnp.zeros((1, F), jnp.float32)
    sl0 = jnp.zeros((1, F), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (J, 1), 0)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (1, J), 1)

    def body(j, carry):
        sh, sl = carry
        rm = rows == j
        rh = jnp.sum(jnp.where(rm, mh, 0.0), axis=0, keepdims=True)
        rl = jnp.sum(jnp.where(rm, ml, 0.0), axis=0, keepdims=True)
        jm = jidx == j
        svh = jnp.sum(jnp.where(jm, vh, 0.0), axis=1, keepdims=True)
        svl = jnp.sum(jnp.where(jm, vl, 0.0), axis=1, keepdims=True)
        return _dd_mac(sh, sl, rh, rl, svh, svl)

    return jax.lax.fori_loop(0, J, body, (sh0, sl0))


def _grid_fc(J: int, F: int) -> int:
    """F-chunk size for the per-instance grid kernels: the (J, FC) hi/lo
    M blocks are double-buffered by Mosaic, so budget ~5 MB of the 16 MB
    scoped VMEM for one copy (observed: (98, 9506) whole-slab blocks
    exceeded the scoped stack by 420 KB at cls_48 shapes, round 5)."""
    # budget ~2 MB for the hi/lo block pair: Mosaic multi-buffers blocks
    # across grid steps (measured ~1.6x the naive double-buffer estimate:
    # a 5 MB pair still hit 16.6 MB scoped at (98, 13312))
    fc = (2 * 2**20) // max(J * 4 * 2, 1)
    fc = max(128, (fc // 128) * 128)
    return min(F, fc)


def _short_kernel(mh_ref, ml_ref, vh_ref, vl_ref, oh_ref, ol_ref):
    """out[g] = sum_j M[(g,) j, fc] * v[g, j] for one F-chunk —
    contraction over the SHORT leading axis J with a wide payload F
    (dS assembly, W^T v).  All intermediates stay 2D (TPU vector
    layout); no cross-chunk reduction."""
    mh = mh_ref[0] if len(mh_ref.shape) == 3 else mh_ref[:]
    ml = ml_ref[0] if len(ml_ref.shape) == 3 else ml_ref[:]
    sh, sl = _short_math(mh, ml, vh_ref[0], vl_ref[0])   # v refs (1,1,J)
    oh_ref[0] = sh
    ol_ref[0] = sl


def dd_contract_short(Mh, Ml, vh, vl):
    """out[g, f] = sum_j M[(g,)j,f] * v[g,j].

    ``M``: (J, F) static-per-batch or (G, J, F) per-instance; v: (G, J).
    Returns (G, F) hi/lo pair.  Vectors travel as (G, 1, L) so every
    block's trailing two dims equal the array dims (Mosaic constraint).
    The F axis is chunked through VMEM (production shapes overflow the
    scoped stack otherwise)."""
    G, J = vh.shape
    static_m = Mh.ndim == 2
    F = Mh.shape[-1]
    FC = _grid_fc(J, F)
    F_p = ((F + FC - 1) // FC) * FC
    if F_p != F:
        pad = [(0, 0)] * (Mh.ndim - 1) + [(0, F_p - F)]
        Mh = jnp.pad(Mh, pad)
        Ml = jnp.pad(Ml, pad)
    if static_m:
        mspec = pl.BlockSpec((J, FC), lambda g, c: (0, c),
                             memory_space=pltpu.VMEM)
    else:
        mspec = pl.BlockSpec((1, J, FC), lambda g, c: (g, 0, c),
                             memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 1, J), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, FC), lambda g, c: (g, 0, c),
                         memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            _short_kernel,
            grid=(G, F_p // FC),
            in_specs=[mspec, mspec, vspec, vspec],
            out_specs=[ospec, ospec],
            out_shape=[jax.ShapeDtypeStruct((G, 1, F_p), jnp.float32)] * 2,
            interpret=_use_interpret(),
        )(Mh, Ml, vh.reshape(G, 1, J), vl.reshape(G, 1, J))
    return oh.reshape(G, F_p)[:, :F], ol.reshape(G, F_p)[:, :F]


def _long_math(mh, ml, vh, vl):
    """sum_f M[j, f] * v[0, f] with M (J, F), v (1, F) -> (J,) pair."""
    ph, pe = _two_prod(mh, vh)
    pe = pe + (mh * vl + ml * vh)
    return _dd_reduce(ph, pe, axis=1)


def _long_kernel(mh_ref, ml_ref, vh_ref, vl_ref, oh_ref, ol_ref):
    """out[g, j] += sum_fc M[(g,) j, fc] * v[g, fc] — contraction over
    the wide trailing axis F (A*-contractions, W u matvecs): elementwise
    TwoProd then a compensated halving-tree reduction per F-chunk,
    dd-accumulated into the revisited (1, 1, J) output block.  The
    F-chunk axis MUST be the innermost grid axis (Pallas TPU in-place
    revisit accumulation is only guaranteed across consecutive steps)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        oh_ref[0] = jnp.zeros(oh_ref.shape[1:], jnp.float32)
        ol_ref[0] = jnp.zeros(ol_ref.shape[1:], jnp.float32)

    mh = mh_ref[0] if len(mh_ref.shape) == 3 else mh_ref[:]
    ml = ml_ref[0] if len(ml_ref.shape) == 3 else ml_ref[:]
    sh, se = _long_math(mh, ml, vh_ref[0], vl_ref[0])    # v refs (1,1,FC)
    oh = oh_ref[0]
    ol = ol_ref[0]
    nh, e1 = _two_sum(oh, sh[None, :])
    oh_ref[0] = nh
    ol_ref[0] = ol + e1 + se[None, :]


def dd_contract_long(Mh, Ml, vh, vl):
    """out[g, j] = sum_f M[(g,)j,f] * v[g,f].

    ``M``: (J, F) or (G, J, F); v: (G, F).  Returns (G, J) hi/lo pair.
    The F (reduction) axis is chunked through VMEM as the innermost grid
    axis (production shapes overflow the scoped stack otherwise)."""
    G, F = vh.shape
    static_m = Mh.ndim == 2
    J = Mh.shape[-2]
    FC = _grid_fc(J, F)
    F_p = ((F + FC - 1) // FC) * FC
    if F_p != F:
        pad = [(0, 0)] * (Mh.ndim - 1) + [(0, F_p - F)]
        Mh = jnp.pad(Mh, pad)
        Ml = jnp.pad(Ml, pad)
        vh = jnp.pad(vh, [(0, 0), (0, F_p - F)])
        vl = jnp.pad(vl, [(0, 0), (0, F_p - F)])
    if static_m:
        mspec = pl.BlockSpec((J, FC), lambda g, c: (0, c),
                             memory_space=pltpu.VMEM)
    else:
        mspec = pl.BlockSpec((1, J, FC), lambda g, c: (g, 0, c),
                             memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 1, FC), lambda g, c: (g, 0, c),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, J), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            _long_kernel,
            grid=(G, F_p // FC),
            in_specs=[mspec, mspec, vspec, vspec],
            out_specs=[ospec, ospec],
            out_shape=[jax.ShapeDtypeStruct((G, 1, J), jnp.float32)] * 2,
            interpret=_use_interpret(),
        )(Mh, Ml, vh.reshape(G, 1, F_p), vl.reshape(G, 1, F_p))
    return oh.reshape(G, J), ol.reshape(G, J)


# ---------------------------------------------------------------------------
# f64-boundary convenience wrappers (einsum drop-ins)
# ---------------------------------------------------------------------------

def _pair(x):
    """Split an operand into an (hi, lo) f32 pair; f32 inputs (e.g. the
    Schur features, f32-valued inverses) are exactly representable, so
    their lo part is zero — no split ops emitted."""
    if isinstance(x, tuple):
        return x
    if x.dtype == jnp.float32:
        return x, jnp.zeros_like(x)
    return split64(x)


def bmm64(A, B):
    """einsum('...ab,...bc->...ac') at ~2^-45 accuracy; f64 or f32
    operands (or pre-split (hi, lo) pairs); leading axes flatten into the
    kernel grid.  Returns f64."""
    shape = jnp.shape(A[0] if isinstance(A, tuple) else A)
    n = shape[-1]
    G = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    Ah, Al = _pair(A)
    Bh, Bl = _pair(B)
    # lanes kernel amortizes over the 128-lane axis; below half-lane
    # occupancy the per-matrix grid kernel wins (no padding waste), and
    # above n~56 the six (n_p, n_p, 128) VMEM buffers overflow the 16 MB
    # scoped stack (measured OOM at n_p = 72)
    n_p = ((max(n, 8) + 7) // 8) * 8
    bmm = (_dd_bmm_lanes if G >= 64 and 6 * n_p * n_p * 128 * 4 <= 12 * 2**20
           else dd_bmm)
    Ch, Cl = bmm(Ah.reshape(G, n, n), Al.reshape(G, n, n),
                 Bh.reshape(G, n, n), Bl.reshape(G, n, n))
    return join64(Ch, Cl).reshape(shape)


def contract_short64(M, v):
    """einsum('(g)jf,gj->gf') at ~2^-45 accuracy; returns f64."""
    Mh, Ml = _pair(M)
    vh, vl = _pair(v)
    fn = (dd_contract_short_lanes if vh.shape[0] >= 64
          else dd_contract_short)
    oh, ol = fn(Mh, Ml, vh, vl)
    return join64(oh, ol)


def contract_long64(M, v):
    """einsum('(g)jf,gf->gj') at ~2^-45 accuracy; returns f64."""
    Mh, Ml = _pair(M)
    vh, vl = _pair(v)
    fn = (dd_contract_long_lanes if vh.shape[0] >= 64
          else dd_contract_long)
    oh, ol = fn(Mh, Ml, vh, vl)
    return join64(oh, ol)


# ---------------------------------------------------------------------------
# lanes-batched contractions (instance index on the lane axis)
# ---------------------------------------------------------------------------
#
# The per-instance grid kernels above cost ~0.8 ms per (128, 34, 1916)
# contraction — each grid cell re-runs the J-loop for ONE instance.  With
# the instance index on the 128-lane axis all instances advance together;
# the F axis is chunked through VMEM (a full (34, 1916, 128) pair slab
# would be 66 MB).

_FC = 128   # default F-axis chunk


def _fc_for(J: int) -> int:
    """F-chunk size so the (J, FC, 128) hi/lo M slabs stay ~<= 4 MB of
    the 16 MB scoped VMEM (J = mp grows to 130+ at production sizes;
    Mosaic multi-buffers blocks, so budget well below half the limit)."""
    fc = (4 * 2**20) // (J * 128 * 4 * 2)
    return max(32, min(_FC, (fc // 32) * 32))


def _contract_short_lanes_kernel(J, mh_ref, ml_ref, vh_ref, vl_ref,
                                 oh_ref, ol_ref):
    """out[fc, g] = sum_j M[j, fc, g] * v[j, g] for one F-chunk."""
    sh = jnp.zeros(oh_ref.shape, jnp.float32)
    sl = jnp.zeros(oh_ref.shape, jnp.float32)

    def body(j, carry):
        sh, sl = carry
        mh = mh_ref[pl.ds(j, 1), :, :][0]          # (FC, G)
        ml = ml_ref[pl.ds(j, 1), :, :][0]
        wh = vh_ref[pl.ds(j, 1), :]                # (1, G)
        wl = vl_ref[pl.ds(j, 1), :]
        return _dd_mac(sh, sl, mh, ml, wh, wl)

    sh, sl = jax.lax.fori_loop(0, J, body, (sh, sl))
    oh_ref[:] = sh
    ol_ref[:] = sl


def _contract_long_lanes_kernel(J, mh_ref, ml_ref, vh_ref, vl_ref,
                                oh_ref, ol_ref):
    """out[j, g] += sum_fc M[j, fc, g] * v[fc, g]; the (J, G) output is
    revisited across F-chunk grid steps and dd-accumulated in place.
    The F-chunk reduction MUST be the innermost (fastest-varying) grid
    axis: Pallas TPU only guarantees in-place revisit accumulation for
    consecutive grid steps on the same output block."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        oh_ref[:] = jnp.zeros(oh_ref.shape, jnp.float32)
        ol_ref[:] = jnp.zeros(ol_ref.shape, jnp.float32)

    vh = vh_ref[:]                                  # (FC, G)
    vl = vl_ref[:]

    def body(j, carry):
        mh = mh_ref[pl.ds(j, 1), :, :][0]           # (FC, G)
        ml = ml_ref[pl.ds(j, 1), :, :][0]
        ph, pe = _two_prod(mh, vh)
        pe = pe + (mh * vl + ml * vh)
        rh, re = _dd_reduce(ph, pe, axis=0)         # (G,)
        oh = oh_ref[pl.ds(j, 1), :]
        ol = ol_ref[pl.ds(j, 1), :]
        nh, e1 = _two_sum(oh, rh[None, :])
        oh_ref[pl.ds(j, 1), :] = nh
        ol_ref[pl.ds(j, 1), :] = ol + e1 + re[None, :]
        return carry

    jax.lax.fori_loop(0, J, body, 0)


def _prep_lanes_m(Mh, Ml, G, J, F, F_p):
    """(G, J, F) or (J, F) static -> (J, F_p, W) pair slabs.

    Static (2D) M materializes ONE 128-lane block (W=_LANES) that the
    BlockSpec index map re-reads for every lane-block grid step, instead
    of broadcasting to all G_p lanes — at production shapes a full
    (J, F_p, G_p) hi/lo slab pair would be hundreds of MB of HBM
    temporaries per call.  Returns (Mh', Ml', G_p, static)."""
    G_p = ((G + _LANES - 1) // _LANES) * _LANES
    static = Mh.ndim == 2
    W = _LANES if static else G_p

    def prep(X):
        if X.ndim == 2:      # static M: one lane block, shared via index map
            Xt = jnp.broadcast_to(X[:, :, None], (J, F, _LANES))
            out = jnp.zeros((J, F_p, _LANES), jnp.float32)
            return out.at[:, :F, :].set(Xt)
        Xt = jnp.transpose(X, (1, 2, 0))
        out = jnp.zeros((J, F_p, W), jnp.float32)
        return out.at[:, :F, :G].set(Xt)

    return prep(Mh), prep(Ml), G_p, static


def _prep_lanes_v(vh, vl, G, D, G_p, D_p=None):
    """(G, D) -> (D_p, G_p) zero-padded transpose (D_p: padded leading
    dim when the kernel grid blocks over it, e.g. the long contract's
    F axis)."""
    D_p = D if D_p is None else D_p

    def prep(X):
        out = jnp.zeros((D_p, G_p), jnp.float32)
        return out.at[:D, :G].set(X.T)
    return prep(vh), prep(vl)


def dd_contract_short_lanes(Mh, Ml, vh, vl):
    """out[g, f] = sum_j M[(g,)j,f] * v[g,j] — lanes variant."""
    G, J = vh.shape
    F = Mh.shape[-1]
    FC = _fc_for(J)
    F_p = ((F + FC - 1) // FC) * FC
    Mhp, Mlp, G_p, mstatic = _prep_lanes_m(Mh, Ml, G, J, F, F_p)
    vhp, vlp = _prep_lanes_v(vh, vl, G, J, G_p)
    mmap = ((lambda c, g: (0, c, 0)) if mstatic
            else (lambda c, g: (0, c, g)))
    mspec = pl.BlockSpec((J, FC, _LANES), mmap,
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((J, _LANES), lambda c, g: (0, g),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((FC, _LANES), lambda c, g: (c, g),
                         memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            functools.partial(_contract_short_lanes_kernel, J),
            grid=(F_p // FC, G_p // _LANES),
            in_specs=[mspec, mspec, vspec, vspec],
            out_specs=[ospec, ospec],
            out_shape=[jax.ShapeDtypeStruct((F_p, G_p), jnp.float32)] * 2,
            interpret=_use_interpret(),
        )(Mhp, Mlp, vhp, vlp)
    return oh[:F, :G].T, ol[:F, :G].T


def dd_contract_long_lanes(Mh, Ml, vh, vl):
    """out[g, j] = sum_f M[(g,)j,f] * v[g,f] — lanes variant."""
    G, F = vh.shape
    J = Mh.shape[-2]
    FC = _fc_for(J)
    F_p = ((F + FC - 1) // FC) * FC
    Mhp, Mlp, G_p, mstatic = _prep_lanes_m(Mh, Ml, G, J, F, F_p)
    vhp, vlp = _prep_lanes_v(vh, vl, G, F, G_p, D_p=F_p)
    # grid: lane blocks OUTER, F-chunk reduction INNERMOST — the output
    # block is revisited across consecutive F-chunk steps only (Pallas
    # TPU accumulation guarantee; see kernel docstring)
    mmap = ((lambda g, c: (0, c, 0)) if mstatic
            else (lambda g, c: (0, c, g)))
    mspec = pl.BlockSpec((J, FC, _LANES), mmap,
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((FC, _LANES), lambda g, c: (c, g),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((J, _LANES), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            functools.partial(_contract_long_lanes_kernel, J),
            grid=(G_p // _LANES, F_p // FC),
            in_specs=[mspec, mspec, vspec, vspec],
            out_specs=[ospec, ospec],
            out_shape=[jax.ShapeDtypeStruct((J, G_p), jnp.float32)] * 2,
            interpret=_use_interpret(),
        )(Mhp, Mlp, vhp, vlp)
    return oh[:, :G].T, ol[:, :G].T
