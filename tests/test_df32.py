"""Double-single (two-f32) compensated contraction math vs f64.

The refine IPM tier's correctness rests on these reaching ~2^-45 relative
accuracy on cancellation-heavy products (ops/df32.py).  The ALGORITHM is
validated here eagerly (per-op IEEE f32 semantics): XLA:CPU's LLVM
backend FMA-contracts `p = a*b` into the following accumulate add on its
vectorized path, which breaks TwoProd/TwoSum invariants, so neither jit
nor pallas-interpret can check exactness on CPU.  The MOSAIC lowering is
validated on TPU hardware by profile_df32.py (results in
PERFORMANCE.md).
"""

import jax
import numpy as np
import pytest

import scipsdp_tpu.ops.df32 as df32


def _split64(x):
    hi = x.astype(np.float32)
    return hi, (x - hi.astype(np.float64)).astype(np.float32)


def _rel(got, want):
    return np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)


def _run(mathfn, *args):
    with jax.disable_jit():
        out = mathfn(*args)
    return tuple(np.asarray(o) for o in out)


def test_bmm_math_accuracy_and_cancellation():
    rng = np.random.default_rng(0)
    n = 24
    A = rng.standard_normal((n, n)) * np.exp(rng.uniform(-6, 6, (n, n)))
    B = rng.standard_normal((n, n))
    want = A @ B
    sh, sl = _run(df32._bmm_math, *_split64(A), *_split64(B))
    got = sh.astype(np.float64) + sl.astype(np.float64)
    assert _rel(got, want) < 1e-11

    # X*S near the central path: O(1) products cancelling to O(mu)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.exp(rng.uniform(-3, 3, n))
    mu = 1e-7
    X = (Q * lam) @ Q.T
    S = (Q * (mu / lam)) @ Q.T
    want = X @ S
    sh, sl = _run(df32._bmm_math, *_split64(X), *_split64(S))
    got = sh.astype(np.float64) + sl.astype(np.float64)
    f32 = (X.astype(np.float32) @ S.astype(np.float32)).astype(np.float64)
    assert _rel(got, want) < 1e-9
    # plain f32 is orders of magnitude worse on the cancellation
    assert _rel(f32, want) > 100.0 * max(_rel(got, want), 1e-15)


def test_short_math():
    rng = np.random.default_rng(2)
    J, F = 34, 200
    M = rng.standard_normal((J, F)) * 1e3
    v = rng.standard_normal((1, J))
    want = np.einsum("jf,xj->xf", M, v)
    sh, sl = _run(df32._short_math, *_split64(M), *_split64(v))
    got = sh.astype(np.float64) + sl.astype(np.float64)
    assert _rel(got, want) < 1e-11


def test_long_math():
    rng = np.random.default_rng(3)
    J, F = 34, 777
    M = rng.standard_normal((J, F)) * np.exp(rng.uniform(-4, 4, (J, F)))
    v = rng.standard_normal((1, F))
    want = np.einsum("jf,xf->j", M, v)
    sh, sl = _run(df32._long_math, *_split64(M), *_split64(v))
    got = sh.astype(np.float64) + sl.astype(np.float64)
    assert _rel(got, want) < 1e-11


def test_split_join_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(100) * np.exp(rng.uniform(-30, 30, 100))
    with jax.disable_jit():
        hi, lo = df32.split64(x)
        back = np.asarray(df32.join64(hi, lo))
    assert _rel(back, x) < 1e-14


def test_contract_lanes_math_accuracy():
    """Eager (IEEE) accuracy of the lanes contraction recurrences; the
    Mosaic lowering itself is validated on TPU (profile_df32.py) — CPU
    jit/interpret FMA-contracts the error-free transforms away (see
    module docstring)."""
    rng = np.random.default_rng(7)
    G, J, F = 6, 9, 300
    M = rng.standard_normal((G, J, F)) * np.exp(rng.uniform(-6, 6, (G, 1, 1)))
    v_s = rng.standard_normal((G, J))
    v_l = rng.standard_normal((G, F))
    Mh, Ml = _split64(np.transpose(M, (1, 2, 0)))
    with jax.disable_jit():
        import jax.numpy as jnp
        # short: out[f, g] = sum_j M[j, f, g] v[j, g]
        sh = jnp.zeros((F, G)); sl = jnp.zeros((F, G))
        vh, vl = _split64(v_s.T)
        for j in range(J):
            sh, sl = df32._dd_mac(sh, sl, Mh[j], Ml[j],
                                  vh[j][None, :], vl[j][None, :])
        got_s = (np.asarray(sh, np.float64) + np.asarray(sl, np.float64)).T
        # long: out[j, g] = sum_f M[j, f, g] v[f, g]
        wh, wl = _split64(v_l.T)
        rows = []
        for j in range(J):
            ph, pe = df32._two_prod(Mh[j], wh)
            pe = pe + (Mh[j] * wl + Ml[j] * wh)
            rh, re = df32._dd_reduce(ph, pe, axis=0)
            rows.append(np.asarray(rh, np.float64) + np.asarray(re, np.float64))
        got_l = np.stack(rows).T
    assert _rel(got_s, np.einsum("gjf,gj->gf", M, v_s)) < 1e-11
    assert _rel(got_l, np.einsum("gjf,gf->gj", M, v_l)) < 1e-11


def test_contract_lanes_kernels_shapes():
    """Lanes kernels produce the right contraction (f32 tolerance under
    CPU interpret; exactness is a TPU-only property)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(8)
    G, J, F = 70, 9, 300   # G >= 64 routes through the lanes kernels
    M = rng.randn(G, J, F)
    v_s = rng.randn(G, J)
    v_l = rng.randn(G, F)
    out_s = np.asarray(df32.contract_short64(jnp.asarray(M), jnp.asarray(v_s)))
    out_l = np.asarray(df32.contract_long64(jnp.asarray(M), jnp.asarray(v_l)))
    assert _rel(out_s, np.einsum("gjf,gj->gf", M, v_s)) < 1e-5
    assert _rel(out_l, np.einsum("gjf,gf->gj", M, v_l)) < 1e-5
    Ms = M[0]
    out_s2 = np.asarray(df32.contract_short64(jnp.asarray(Ms), jnp.asarray(v_s)))
    assert _rel(out_s2, np.einsum("jf,gj->gf", Ms, v_s)) < 1e-5


def test_contract_grid_kernels_fchunked():
    """Per-instance grid kernels must chunk the F axis through VMEM: at
    cls_48 production shapes ((J, F) = (98, 9506)) whole-slab blocks
    exceeded the 16 MB scoped stack by 420 KB (round-5 TPU compile OOM).
    Shapes here force multiple F-chunks (J large -> small FC)."""
    import jax.numpy as jnp
    G, J, F = 4, 700, 2000
    assert df32._grid_fc(J, F) < F     # the shape actually chunks
    rng = np.random.RandomState(11)
    M = rng.randn(G, J, F)
    v_s = rng.randn(G, J)
    v_l = rng.randn(G, F)
    out_s = np.asarray(df32.contract_short64(jnp.asarray(M), jnp.asarray(v_s)))
    out_l = np.asarray(df32.contract_long64(jnp.asarray(M), jnp.asarray(v_l)))
    assert _rel(out_s, np.einsum("gjf,gj->gf", M, v_s)) < 1e-5
    assert _rel(out_l, np.einsum("gjf,gf->gj", M, v_l)) < 1e-5
    Ms = M[0]
    out_s2 = np.asarray(df32.contract_short64(jnp.asarray(Ms), jnp.asarray(v_s)))
    out_l2 = np.asarray(df32.contract_long64(jnp.asarray(Ms), jnp.asarray(v_l)))
    assert _rel(out_s2, np.einsum("jf,gj->gf", Ms, v_s)) < 1e-5
    assert _rel(out_l2, np.einsum("jf,gf->gj", Ms, v_l)) < 1e-5


@pytest.mark.parametrize("G,J,F", [
    (70, 65, 300),    # J >= 57 drops FC below 128: grid must use FC,
                      # not the constant _FC (round-4 advisor high)
    (200, 65, 300),   # G_p = 256 > 128: long-kernel accumulation must
                      # be innermost-grid-consecutive per output block
    (130, 9, 130),
])
def test_contract_lanes_kernels_large_shapes(G, J, F):
    """Production-tier shapes for the lanes contraction kernels (J grows
    to ~130 at cls_48/cls_64; B up to 128+).  Guards the grid-count and
    accumulation-order bugs found in round 4."""
    import jax.numpy as jnp
    assert df32._fc_for(J) < df32._FC or J < 57
    rng = np.random.RandomState(9)
    M = rng.randn(G, J, F)
    v_s = rng.randn(G, J)
    v_l = rng.randn(G, F)
    out_s = np.asarray(df32.contract_short64(jnp.asarray(M), jnp.asarray(v_s)))
    out_l = np.asarray(df32.contract_long64(jnp.asarray(M), jnp.asarray(v_l)))
    assert _rel(out_s, np.einsum("gjf,gj->gf", M, v_s)) < 1e-5
    assert _rel(out_l, np.einsum("gjf,gf->gj", M, v_l)) < 1e-5
    # static (2D) M: shared lane block via index map, no G_p broadcast
    Ms = M[0]
    out_s2 = np.asarray(df32.contract_short64(jnp.asarray(Ms), jnp.asarray(v_s)))
    out_l2 = np.asarray(df32.contract_long64(jnp.asarray(Ms), jnp.asarray(v_l)))
    assert _rel(out_s2, np.einsum("jf,gj->gf", Ms, v_s)) < 1e-5
    assert _rel(out_l2, np.einsum("jf,gf->gj", Ms, v_l)) < 1e-5
