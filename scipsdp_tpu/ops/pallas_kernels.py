"""Pallas TPU kernels for the IPM hot path.

The BASELINE north star names the Schur-complement assembly as the kernel
to own.  After the W-factorization (ops/ipm.py), assembly is the batched
Gram product  M = Wall @ Wall^T  with Wall (B, mp, F); this kernel tiles it
explicitly for the MXU with an F-chunk accumulation loop, fp32 accumulation
when inputs are fp32, and VMEM-resident tiles.

Grid: (B, mp/TI, mp/TJ); each program accumulates one (TI, TJ) output tile
over F chunks.  Shapes are padded to tile multiples by the wrapper (zero
padding contributes nothing to the Gram product).

Note: the production default stays on the XLA batched matmul
(`IPMSettings.use_pallas = False`): a plain Gram product is already
MXU-shape-optimal under XLA, and this environment's Mosaic toolchain
rejects kernels traced under jax_enable_x64 (i64 index legalization),
which the f64 IPM requires.  The kernel is exercised in interpret mode by
tests/test_pallas.py and is ready for f32 / fixed-toolchain deployments.
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
    """One (TILE, TILE) tile of W W^T, accumulating over F chunks."""
    nf = wi_ref.shape[-1]
    acc = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    def chunk(c, acc):
        a = wi_ref[0, :, pl.ds(c * FCHUNK, FCHUNK)]
        b = wj_ref[0, :, pl.ds(c * FCHUNK, FCHUNK)]
        return acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=out_ref.dtype,
        )

    if nf % FCHUNK == 0 and nf > FCHUNK:
        acc = jax.lax.fori_loop(0, nf // FCHUNK, chunk, acc)
    else:
        a = wi_ref[0, :, :]
        b = wj_ref[0, :, :]
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=out_ref.dtype,
        )
    out_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_wwt(Wall: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched Gram product  M[b] = Wall[b] @ Wall[b]^T  as a Pallas kernel.

    Wall: (B, mp, F); returns (B, mp, mp).  Pads mp to the 128 MXU tile and
    F to the lane width; zero padding is inert in the Gram product.
    """
    B, mp, F = Wall.shape
    mp_p = _round_up(max(mp, 8), TILE)
    F_p = _round_up(max(F, 128), 128)
    W = jnp.zeros((B, mp_p, F_p), Wall.dtype).at[:, :mp, :F].set(Wall)

    grid = (B, mp_p // TILE, mp_p // TILE)
    out = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE, F_p), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, TILE, F_p), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, TILE), lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, mp_p, mp_p), Wall.dtype),
        interpret=interpret,
    )(W, W)
    return out[:, :mp, :mp]
