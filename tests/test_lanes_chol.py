"""Lanes-batched Cholesky / fused inverse kernels (interpret mode on CPU;
the real-TPU compile is exercised by profile/bench runs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scipsdp_tpu.ops.pallas_kernels import cholesky_lanes, chol_inverse_lanes

INTERP = jax.default_backend() == "cpu"


def spd(rng, N, n):
    a = rng.randn(N, n, n)
    return np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)


# (384, 65): the stacked probe ladder at cls_32 B=128 — 3 lane blocks at
# n_p=72; a single gridded pallas_call let XLA promote the whole operand
# into scoped VMEM (21.12M > 16M compile-time OOM).  Regression for the
# per-block lax.map in _lanes_call.
@pytest.mark.parametrize("N,n", [(3, 5), (16, 43), (130, 17), (1, 64),
                                 (384, 65)])
def test_cholesky_lanes_matches_xla(N, n):
    rng = np.random.RandomState(0)
    A = jnp.asarray(spd(rng, N, n), jnp.float32)
    L = cholesky_lanes(A, interpret=INTERP)
    Lref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref),
                               rtol=2e-4, atol=2e-4)


def test_cholesky_lanes_nan_semantics():
    rng = np.random.RandomState(1)
    A = spd(rng, 8, 12)
    A[3] -= 40.0 * np.eye(12)   # indefinite lane
    L = np.asarray(cholesky_lanes(jnp.asarray(A, jnp.float32),
                                  interpret=INTERP))
    assert np.isnan(L[3]).any()
    for b in range(8):
        if b != 3:
            assert not np.isnan(L[b]).any()


def test_chol_inverse_lanes():
    rng = np.random.RandomState(2)
    A = jnp.asarray(spd(rng, 20, 43), jnp.float32)
    Linv = chol_inverse_lanes(A, interpret=INTERP)
    Lref = np.linalg.cholesky(np.asarray(A, np.float64))
    ref = np.linalg.inv(Lref)
    np.testing.assert_allclose(np.asarray(Linv), ref, rtol=3e-3, atol=3e-3)


def test_chol_inverse_lanes_leading_shape():
    rng = np.random.RandomState(3)
    A = jnp.asarray(spd(rng, 12, 9).reshape(3, 4, 9, 9), jnp.float32)
    Linv = chol_inverse_lanes(A, interpret=INTERP)
    assert Linv.shape == (3, 4, 9, 9)
    flat = chol_inverse_lanes(A.reshape(12, 9, 9), interpret=INTERP)
    np.testing.assert_allclose(np.asarray(Linv).reshape(12, 9, 9),
                               np.asarray(flat), rtol=1e-5)
