"""Pallas TPU kernels for the IPM hot path.

The BASELINE north star names the Schur-complement assembly as the kernel
to own.  After the W-factorization (ops/ipm.py), assembly is the batched
Gram product  M = Wall @ Wall^T  with Wall (B, mp, F); this kernel tiles it
explicitly for the MXU with an F-chunk accumulation loop, fp32 accumulation
when inputs are fp32, and VMEM-resident tiles.

Grid: (B, mp/TI, mp/TJ); each program accumulates one (TI, TJ) output tile
over F chunks.  Shapes are padded to tile multiples by the wrapper (zero
padding contributes nothing to the Gram product).

Deployment note: Mosaic rejects kernels TRACED under jax_enable_x64 (i64
index legalization), which the f64 IPM enables globally.  The fix is to
trace the kernel inside a ``jax.enable_x64(False)`` scope — kernels here
do that, so the f32 kernels compile and run on real TPU hardware from
inside the x64 program (exercised by the phase32 mixed-precision IPM
path with ``IPMSettings.use_pallas = True``).  f64 inputs fall back to
the XLA batched matmul (Mosaic has no f64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # probe TPU-pallas availability (kernel runs via pl on any backend)
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

TILE = 128
FCHUNK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gram_kernel(wi_ref, wj_ref, out_ref):
    """One (TILE, TILE) output tile of W W^T; the F axis is a GRID
    dimension (innermost), so only one (TILE, FCHUNK) slab per operand is
    VMEM-resident at a time — full-F row blocks OOM the 16 MB VMEM at
    production F.  The output tile is revisited across F steps and
    accumulated in place."""
    c = pl.program_id(3)

    @pl.when(c == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    out_ref[0, :, :] += jax.lax.dot_general(
        wi_ref[0, :, :], wj_ref[0, :, :], (((1,), (1,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _chol_kernel(n_live: int, a_ref, o_ref):
    """Left-looking Cholesky of one (n, n) tile; only the leading
    ``n_live`` columns are factored (the rest is lane padding).

    Column j is produced with NO dynamic lane indexing: one-hot selectors
    turn row/column reads and the column write into matvecs/outer products
    (VPU/MXU-friendly; 3 n^2 work per column).  Non-PSD input yields NaN
    exactly like LAPACK potrf — the IPM uses Cholesky NaNs as its PSD
    probe, so the semantics must match jnp.linalg.cholesky."""
    A = a_ref[0]
    n = A.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=A.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    def body(j, L):
        oh = (iota == j).astype(A.dtype)             # e_j as (n, 1)
        ljrow = mm(oh.T, L)                          # (1, n) = L[j, :]
        s = mm(L, ljrow.T)                           # (n, 1) partial sums
        c = mm(A, oh) - s                            # A[:, j] - s  (A sym)
        d = jnp.sqrt(jnp.sum(c * oh))                # sqrt(c[j]); NaN if <0
        below = (iota > j).astype(A.dtype)
        colvals = d * oh + below * c / d             # (n, 1)
        return L + mm(colvals, oh.T)                 # write column j

    o_ref[0] = jax.lax.fori_loop(0, n_live, body, jnp.zeros_like(A))


def _trinv_kernel(n_live: int, l_ref, o_ref):
    """Forward substitution  X = L^{-1}  of one (n, n) lower tile, same
    one-hot technique (row i of X per iteration), ``n_live`` live rows."""
    L = l_ref[0]
    n = L.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=L.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    def body(i, X):
        oh = (iota == i).astype(L.dtype)             # e_i as (n, 1)
        li = mm(oh.T, L)                             # (1, n) = L[i, :]
        strict = li * (iota.T < i).astype(L.dtype)   # (1, n) = L[i, :i]
        contrib = mm(strict, X)                      # (1, n)
        dinv = 1.0 / jnp.sum(li * oh.T)              # 1 / L[i, i]
        xi = (oh.T - contrib) * dinv                 # (1, n) row i of X
        return X + mm(oh, xi)

    o_ref[0] = jax.lax.fori_loop(0, n_live, body, jnp.zeros_like(L))


def _tile_call(kernel, A: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Run a per-instance (n, n) tile kernel over a stacked (N, n, n)
    batch, padding n to the f32 tile minimum with an identity tail (inert
    for both Cholesky and triangular inversion)."""
    N, n, _ = A.shape
    n_p = _round_up(max(n, 8), 128)
    if n_p != n:
        Ap = jnp.zeros((N, n_p, n_p), A.dtype)
        Ap = Ap.at[:, :n, :n].set(A)
        pad = jnp.arange(n, n_p)
        Ap = Ap.at[:, pad, pad].set(1.0)
    else:
        Ap = A
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(kernel, n),   # loop only the live columns
            grid=(N,),
            in_specs=[pl.BlockSpec((1, n_p, n_p), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, n_p, n_p), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, n_p, n_p), A.dtype),
            interpret=interpret,
        )(Ap)
    return out[:, :n, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky(A: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched lower Cholesky, Pallas path for f32 (any leading batch
    shape); f64 falls back to XLA."""
    if A.dtype == jnp.float64:
        return jnp.linalg.cholesky(A)
    lead = A.shape[:-2]
    n = A.shape[-1]
    L = _tile_call(_chol_kernel, A.reshape((-1, n, n)), interpret)
    return L.reshape(lead + (n, n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def tril_inverse(L: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched lower-triangular inverse (the W-feature step's triangular
    solves with identity RHS), Pallas path for f32; f64 falls back to
    XLA's solve_triangular."""
    if L.dtype == jnp.float64:
        eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    lead = L.shape[:-2]
    n = L.shape[-1]
    X = _tile_call(_trinv_kernel, L.reshape((-1, n, n)), interpret)
    return X.reshape(lead + (n, n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_wwt(Wall: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched Gram product  M[b] = Wall[b] @ Wall[b]^T  as a Pallas kernel.

    Wall: (B, mp, F); returns (B, mp, mp).  Pads mp to the 128 MXU tile and
    F to the lane width; zero padding is inert in the Gram product.

    f64 inputs (Mosaic has no f64) use the XLA batched matmul instead, so
    the call is always safe regardless of the IPM's precision phase.
    """
    if Wall.dtype == jnp.float64:
        return jnp.einsum("bif,bjf->bij", Wall, Wall)
    B, mp, F = Wall.shape
    mp_p = _round_up(max(mp, 8), TILE)
    fchunk = min(FCHUNK, _round_up(max(F, 128), 128))
    F_p = _round_up(max(F, 128), fchunk)
    W = jnp.zeros((B, mp_p, F_p), Wall.dtype).at[:, :mp, :F].set(Wall)

    # F innermost so each output tile sees its F steps consecutively
    grid = (B, mp_p // TILE, mp_p // TILE, F_p // fchunk)
    # trace in x32 scope: Mosaic rejects i64 grid/index arithmetic, which
    # jax_enable_x64 (required by the f64 IPM) would otherwise introduce
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _gram_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TILE, fchunk),
                             lambda b, i, j, c: (b, i, c)),
                pl.BlockSpec((1, TILE, fchunk),
                             lambda b, i, j, c: (b, j, c)),
            ],
            out_specs=pl.BlockSpec((1, TILE, TILE),
                                   lambda b, i, j, c: (b, i, j)),
            out_shape=jax.ShapeDtypeStruct((B, mp_p, mp_p), Wall.dtype),
            interpret=interpret,
        )(W, W)
    return out[:, :mp, :mp]


# ---------------------------------------------------------------------------
# Lanes-batched factorizations: the batch on the 128-lane axis
# ---------------------------------------------------------------------------
#
# The blocked per-matrix Cholesky (XLA's and `cholesky` above) costs
# ~4.5 us/matrix at n=43 regardless of batch width — the sequential
# column loop runs once PER matrix.  For the IPM's shapes (n <= ~100,
# thousands of matrices per dispatch: the X/S factors, the probe-ladder
# trials, the feasibility probes) the right layout is (n, n, N) with the
# MATRIX index on the lane axis: one sequential column loop over n steps,
# each step updating all 128 lanes' matrices at once on the VPU.  Work
# per step is (n, n, 128) fused multiply-adds; the whole factorization of
# 128 matrices costs about one matrix's worth of sequential steps.
#
# NaN semantics match potrf: a non-PSD lane produces sqrt(<0) = NaN which
# propagates through that lane's trailing submatrix only (updates are
# where-masked, so clean lanes are unaffected).  The IPM's PSD probes
# rely on exactly this.

LANES = 128


def _chol_lanes_kernel(n_live: int, a_ref, o_ref):
    """Right-looking Cholesky of 128 matrices; a_ref/o_ref: (n, n, 128)
    with [row, col, lane] layout.  Only the leading ``n_live`` rows/cols
    are factored (the rest is identity padding).

    No transposes: the row vector of the rank-1 trailing update is read
    from the (still symmetric) trailing part of the work matrix."""
    n = a_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    o_ref[:] = a_ref[:]

    def body(k, carry):
        d = jnp.sqrt(o_ref[pl.ds(k, 1), pl.ds(k, 1), :])     # (1,1,128)
        c = o_ref[:, pl.ds(k, 1), :] / d                     # (n,1,128)
        r = o_ref[pl.ds(k, 1), :, :] / d                     # (1,n,128)
        A = o_ref[:]
        live = (row > k) & (col > k) & (col < n_live)
        A = jnp.where(live, A - c * r, A)
        colk = jnp.where(row == k, d, jnp.where(row > k, c, 0.0))
        A = jnp.where(col == k, colk, A)
        o_ref[:] = A
        return carry

    jax.lax.fori_loop(0, n_live, body, 0, unroll=False)


def _cholinv_lanes_kernel(n_live: int, a_ref, o_ref, a_scratch):
    """Fused Cholesky + lower-triangular inverse: o_ref <- L^{-1} with
    A = L L^T, one kernel.  The forward substitution runs interleaved
    with the elimination (row ops on an identity block), so no factor is
    stored and no transposes are needed; a non-PSD lane NaNs its own
    inverse exactly like potrf + solve would."""
    n = a_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    a_scratch[:] = a_ref[:]
    o_ref[:] = ((row == col) & (col < n_live)).astype(a_ref.dtype) \
        + jnp.zeros_like(a_ref[:])

    def body(k, carry):
        d = jnp.sqrt(a_scratch[pl.ds(k, 1), pl.ds(k, 1), :])  # (1,1,128)
        c = a_scratch[:, pl.ds(k, 1), :] / d                  # (n,1,128)
        r = a_scratch[pl.ds(k, 1), :, :] / d                  # (1,n,128)
        A = a_scratch[:]
        live = (row > k) & (col > k) & (col < n_live)
        a_scratch[:] = jnp.where(live, A - c * r, A)
        # X row k scales by 1/d, rows below subtract c * x_k
        xk = o_ref[pl.ds(k, 1), :, :] / d                     # (1,n,128)
        X = o_ref[:]
        X = jnp.where(row == k, xk, X)
        X = jnp.where(row > k, X - c * xk, X)
        o_ref[:] = X
        return carry

    jax.lax.fori_loop(0, n_live, body, 0, unroll=False)


def _lanes_call(kernel, A: jnp.ndarray, interpret: bool,
                scratch: bool) -> jnp.ndarray:
    """Run a lanes-batched kernel over a (N, n, n) stack: transpose to
    (n, n, N), pad n to the sublane multiple with an inert identity tail
    and N to the lane width with identity matrices, grid over N/128."""
    N, n, _ = A.shape
    n_p = _round_up(max(n, 8), 8)
    N_p = _round_up(max(N, LANES), LANES)
    At = jnp.transpose(A, (1, 2, 0))                    # (n, n, N)
    Ap = jnp.zeros((n_p, n_p, N_p), A.dtype)
    Ap = Ap.at[:n, :n, :N].set(At)
    # identity tails keep every padded row/col/lane factorizable
    rng = jnp.arange(n, n_p)
    Ap = Ap.at[rng, rng, :].set(1.0)
    lrng = jnp.arange(N, N_p)
    nrng = jnp.arange(n)
    Ap = Ap.at[nrng[:, None], nrng[:, None], lrng[None, :]].set(1.0)

    # one pallas_call per 128-lane block: a single call gridded over
    # N_p/128 lets XLA promote the WHOLE (n_p, n_p, N_p) operand into
    # scoped VMEM, which overflows the 16 MB stack once the stacked
    # probe ladder reaches ~3x128 lanes at n>=65 (measured: f32
    # [104,104,384] -> 21.12M scoped alloc, compile-time VMEM OOM at
    # cls_32 B=128).  lax.map keeps each call's operand at one block.
    def one(block):
        with jax.enable_x64(False):
            return pl.pallas_call(
                functools.partial(kernel, n),
                grid=(1,),
                in_specs=[pl.BlockSpec((n_p, n_p, LANES),
                                       lambda b: (0, 0, 0))],
                out_specs=pl.BlockSpec((n_p, n_p, LANES),
                                       lambda b: (0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((n_p, n_p, LANES), A.dtype),
                scratch_shapes=([pltpu.VMEM((n_p, n_p, LANES), A.dtype)]
                                if scratch else []),
                interpret=interpret,
            )(block)

    if N_p == LANES:
        out = one(Ap)
    else:
        blocks = jnp.moveaxis(
            Ap.reshape(n_p, n_p, N_p // LANES, LANES), 2, 0)
        out = jnp.moveaxis(jax.lax.map(one, blocks), 0, 2)
        out = out.reshape(n_p, n_p, N_p)
    return jnp.transpose(out[:n, :n, :N], (2, 0, 1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_lanes(A: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched lower Cholesky with the batch on the lane axis (f32; f64
    falls back to XLA).  ~constant cost per 128 matrices at IPM sizes."""
    n = A.shape[-1]
    n_p = _round_up(max(n, 8), 8)
    # 2 (n_p, n_p, 128) VMEM buffers (in + in-place out) must fit the
    # 16 MB scoped stack
    if A.dtype == jnp.float64 or 2 * n_p * n_p * 128 * 4 > 12 * 2**20:
        return jnp.linalg.cholesky(A)
    lead = A.shape[:-2]
    L = _lanes_call(_chol_lanes_kernel, A.reshape((-1, n, n)),
                    interpret, scratch=False)
    return L.reshape(lead + (n, n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inverse_lanes(A: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused  A -> L^{-1}  (A = L L^T) with the batch on the lane axis
    (f32; f64 falls back to XLA).  Replaces the chol + tril_inverse pair
    in one kernel; NaN lanes mark failed factorizations exactly like
    potrf."""
    n = A.shape[-1]
    n_p = _round_up(max(n, 8), 8)
    # 3 (n_p, n_p, 128) VMEM buffers (in + scratch + out) must fit
    if A.dtype == jnp.float64 or 3 * n_p * n_p * 128 * 4 > 12 * 2**20:
        L = jnp.linalg.cholesky(A)
        eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    lead = A.shape[:-2]
    X = _lanes_call(_cholinv_lanes_kernel, A.reshape((-1, n, n)),
                    interpret, scratch=True)
    return X.reshape(lead + (n, n))
