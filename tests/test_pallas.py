"""Pallas Schur-product kernel vs the XLA reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from scipsdp_tpu.ops.pallas_kernels import schur_wwt


def test_gram_kernel_matches_einsum():
    rng = np.random.default_rng(0)
    for B, mp, F in [(2, 35, 577), (1, 8, 64), (3, 130, 1024)]:
        W = jnp.asarray(rng.standard_normal((B, mp, F)))
        M1 = np.asarray(schur_wwt(W, interpret=True))
        M2 = np.einsum("xif,xjf->xij", W, W)
        assert np.abs(M1 - M2).max() < 1e-9


def test_gram_kernel_fchunk_loop():
    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.standard_normal((1, 16, 1024)))  # 2 F-chunks
    M1 = np.asarray(schur_wwt(W, interpret=True))
    M2 = np.einsum("xif,xjf->xij", W, W)
    assert np.abs(M1 - M2).max() < 1e-9
