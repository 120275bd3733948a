"""Fused direction kernels (ops/fused.py) vs f64 reference computations.

Runs in Pallas interpreter mode on CPU; the same code paths compile to
Mosaic on TPU (profile_fused.py measures them there)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

import scipsdp_tpu.ops.fused as fused


def split64(x):
    hi = np.asarray(x).astype(np.float32)
    return hi, (np.asarray(x) - hi.astype(np.float64)).astype(np.float32)


def join64(hi, lo):
    return np.asarray(hi).astype(np.float64) + np.asarray(lo).astype(
        np.float64)


def _run(mathfn, *args):
    """Eager per-op IEEE f32 execution: XLA:CPU's vectorized path
    FMA-contracts a*b into fused accumulates, breaking the error-free
    transforms (see tests/test_df32.py), so neither jit nor
    pallas-interpret can validate exactness on CPU."""
    with jax.disable_jit():
        out = mathfn(*args)
    return tuple(np.asarray(o) for o in out)

rng = np.random.default_rng(7)
B, K, n, mp = 4, 2, 13, 9
F = 37


def _sym(a):
    return 0.5 * (a + np.swapaxes(a, -1, -2))


def test_rhs_bucket_matches_f64():
    A = _sym(rng.standard_normal((K, mp, n, n)))
    Rc = rng.standard_normal((B, K, n, n)) * 1e-6   # corrector-scale
    XRp = rng.standard_normal((B, K, n, n)) * 1e-6
    Sinv = _sym(rng.standard_normal((B, K, n, n))).astype(np.float32)
    Ph = np.einsum("zkac,zkcd->zkad", Rc - XRp, Sinv.astype(np.float64))
    want = np.einsum("kjpq,zkqp->zj", A, Ph)
    got = join64(*_run(fused._rhs_math, *split64(A), *split64(Rc),
                       *split64(XRp), jnp.asarray(Sinv)))
    np.testing.assert_allclose(np.asarray(got), want,
                               rtol=0, atol=1e-12 * np.abs(want).max())


def test_schur_solve_fused_matches_f64():
    W = rng.standard_normal((B, mp, F)).astype(np.float32)
    diag = np.abs(rng.standard_normal((B, mp))) * 1e3
    reg = np.full((B,), 1e-7)
    fix = np.zeros((B, mp), bool)
    fix[:, -1] = True
    rhs = rng.standard_normal((B, mp))
    W64 = W.astype(np.float64)
    # reference: exact solve of the live subsystem
    want = np.zeros((B, mp))
    for b in range(B):
        live = ~fix[b]
        M = (W64[b] @ W64[b].T + np.diag(diag[b])
             + reg[b] * np.eye(mp))[np.ix_(live, live)]
        want[b, live] = np.linalg.solve(M, rhs[b, live])
    # preconditioner exactly as the refine tier builds it
    Mfull = (np.einsum("bif,bjf->bij", W64, W64)
             + np.eye(mp)[None] * diag[:, :, None]
             + reg[:, None, None] * np.eye(mp)[None])
    Mfull[:, :, :] = np.where(fix[:, :, None] | fix[:, None, :], 0.0, Mfull)
    Mfull += np.eye(mp)[None] * fix[:, :, None]
    dM = np.maximum(np.einsum("bii->bi", Mfull), 1e-30)
    dsc = 1.0 / np.sqrt(dM)
    Ms = Mfull * dsc[:, :, None] * dsc[:, None, :]
    Minv = np.linalg.inv(Ms.astype(np.float32)).astype(np.float32)
    got = join64(*_run(
        fused._schur_math, 3, jnp.asarray(W), *split64(rhs),
        jnp.asarray(Minv), *split64(dsc),
        *split64(np.broadcast_to(diag, (B, mp))),
        *split64(np.broadcast_to(reg[:, None], (B, mp))),
        jnp.asarray(fix.astype(np.float32))))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10 * scale)


def test_recover_bucket_matches_f64():
    A = _sym(rng.standard_normal((K, mp, n, n)))
    dy = rng.standard_normal((B, mp)) * 1e-3
    Rp = rng.standard_normal((B, K, n, n)) * 1e-7
    Rc = rng.standard_normal((B, K, n, n)) * 1e-6
    X = _sym(rng.standard_normal((B, K, n, n)))
    Sinv = _sym(rng.standard_normal((B, K, n, n))).astype(np.float32)
    pad = np.ones((B, K, n, n), bool)
    dS_want = np.einsum("kjpq,zj->zkpq", A, dy) + Rp
    dX_want = np.einsum(
        "zkac,zkcd->zkad", Rc - np.einsum("zkac,zkcd->zkad", X, dS_want),
        Sinv.astype(np.float64))
    dyh, dyl = split64(dy)
    out = _run(fused._recover_math, *split64(A),
               dyh.reshape(B, mp, 1, 1), dyl.reshape(B, mp, 1, 1),
               *split64(Rp), *split64(Rc), *split64(X),
               jnp.asarray(Sinv), jnp.asarray(pad.astype(np.float32)))
    dS = join64(out[0], out[1])
    dX = join64(out[2], out[3])
    np.testing.assert_allclose(dS, dS_want, rtol=0,
                               atol=1e-12 * max(1.0, np.abs(dS_want).max()))
    np.testing.assert_allclose(dX, dX_want, rtol=0,
                               atol=1e-11 * max(1.0, np.abs(dX_want).max()))
