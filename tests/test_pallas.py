"""Pallas kernels vs XLA references (interpret mode on CPU; the same
kernels compile for real on the TPU backend — see PERFORMANCE.md A/B)."""

import numpy as np
import jax.numpy as jnp

from scipsdp_tpu.ops.pallas_kernels import cholesky, schur_wwt, tril_inverse


def test_gram_kernel_matches_einsum():
    rng = np.random.default_rng(0)
    for B, mp, F in [(2, 35, 577), (1, 8, 64), (3, 130, 1024)]:
        W = jnp.asarray(rng.standard_normal((B, mp, F)), jnp.float32)
        M1 = np.asarray(schur_wwt(W, interpret=True))
        M2 = np.einsum("xif,xjf->xij", np.asarray(W), np.asarray(W))
        scale = max(1.0, np.abs(M2).max())
        assert np.abs(M1 - M2).max() / scale < 1e-5


def test_gram_kernel_fchunk_loop():
    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.standard_normal((1, 16, 1024)), jnp.float32)
    M1 = np.asarray(schur_wwt(W, interpret=True))
    M2 = np.einsum("xif,xjf->xij", np.asarray(W), np.asarray(W))
    assert np.abs(M1 - M2).max() / np.abs(M2).max() < 1e-5


def test_gram_kernel_f64_fallback():
    rng = np.random.default_rng(2)
    W = jnp.asarray(rng.standard_normal((2, 9, 33)))   # f64 under x64
    M1 = np.asarray(schur_wwt(W, interpret=True))
    M2 = np.einsum("xif,xjf->xij", np.asarray(W), np.asarray(W))
    assert np.abs(M1 - M2).max() < 1e-9


def _spd(rng, N, n):
    A = rng.standard_normal((N, n, n)).astype(np.float32)
    return A @ np.transpose(A, (0, 2, 1)) + n * np.eye(n, dtype=np.float32)


def test_cholesky_kernel_matches_lapack():
    rng = np.random.default_rng(3)
    for N, n in [(4, 20), (2, 48), (1, 128)]:
        A = _spd(rng, N, n)
        L1 = np.asarray(cholesky(jnp.asarray(A), interpret=True))
        L2 = np.linalg.cholesky(A.astype(np.float64))
        assert np.abs(L1 - L2).max() / np.abs(L2).max() < 1e-4


def test_cholesky_kernel_nan_on_nonpsd():
    """The IPM's PSD probes rely on potrf-style NaN for non-PSD input."""
    rng = np.random.default_rng(4)
    A = _spd(rng, 3, 16)
    A[1] -= 100.0 * np.eye(16, dtype=np.float32)
    L = np.asarray(cholesky(jnp.asarray(A), interpret=True))
    assert np.isnan(L[1]).any()
    assert np.isfinite(L[0]).all() and np.isfinite(L[2]).all()


def test_tril_inverse_matches_solve():
    rng = np.random.default_rng(5)
    for N, n in [(4, 20), (1, 96)]:
        L = np.linalg.cholesky(_spd(rng, N, n).astype(np.float64))
        X = np.asarray(tril_inverse(jnp.asarray(L, jnp.float32),
                                    interpret=True))
        err = np.abs(X @ L - np.eye(n)).max()
        assert err < 1e-4


def test_ipm_solves_with_pallas_switch():
    """use_pallas=True must be a no-op off-TPU (backend gate) and the solve
    must still converge."""
    from scipsdp_tpu.core.sdpi import SDPInterface
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.models.problem import densify
    from scipsdp_tpu.utils.config import IPMSettings, Settings

    prob = read_problem("/root/reference/instances/example_small.dat-s")
    s = Settings(ipm=IPMSettings(use_pallas=True))
    iface = SDPInterface(densify(prob), s)
    res = iface.solve_batch(prob.lb[None, :], prob.ub[None, :])
    assert res.objval[0] < -8.0 + 1e-4
