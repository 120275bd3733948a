"""c-MIR strengthening + sparse multi-cut tests (cons_sdp.c CMIR path)."""

import itertools

import numpy as np

from scipsdp_tpu.ops.cmir import cmir_cut


def test_cmir_pure_integer_rounding():
    # y integer in [0, 10], base row  -y >= -2.5  (i.e. y <= 2.5)
    # MIR: y <= 2
    g = np.array([-1.0])
    out = cmir_cut(g, -2.5, np.array([0.0]), np.array([10.0]),
                   np.array([True]), np.array([2.5]))
    assert out is not None
    gc, rc = out
    # cut must be violated at y* = 2.5 and hold at all integers <= 2
    assert gc @ np.array([2.5]) < rc - 1e-9
    for yi in range(3):
        assert gc @ np.array([float(yi)]) >= rc - 1e-9


def test_cmir_mixed_integer():
    # y int >= 0, x cont >= 0:  y - x <= 2.5  ->  MIR  y - 2x <= 2
    g = np.array([-1.0, 1.0])      # >=-form: -y + x >= -2.5
    out = cmir_cut(g, -2.5, np.zeros(2), np.full(2, 100.0),
                   np.array([True, False]), np.array([2.5, 0.0]))
    assert out is not None
    gc, rc = out
    np.testing.assert_allclose(gc, [-1.0, 2.0])
    np.testing.assert_allclose(rc, -2.0)


def test_cmir_validity_bruteforce():
    """Every c-MIR cut must hold at every mixed-integer point of the box
    satisfying the base row."""
    rng = np.random.default_rng(0)
    nfound = 0
    for trial in range(200):
        m = 3
        g = rng.integers(-3, 4, m).astype(float)
        lhs = float(rng.integers(-6, 7)) + rng.choice([0.0, 0.3, 0.5])
        lb = np.zeros(m)
        ub = rng.integers(1, 4, m).astype(float)
        integral = rng.random(m) < 0.7
        ystar = lb + rng.random(m) * (ub - lb)
        out = cmir_cut(g, lhs, lb, ub, integral, ystar)
        if out is None:
            continue
        nfound += 1
        gc, rc = out
        # enumerate integer grid x continuous samples
        axes = []
        for j in range(m):
            if integral[j]:
                axes.append(np.arange(lb[j], ub[j] + 0.5))
            else:
                axes.append(np.linspace(lb[j], ub[j], 5))
        for pt in itertools.product(*axes):
            y = np.array(pt)
            if g @ y >= lhs - 1e-9:           # feasible for the base row
                assert gc @ y >= rc - 1e-7, (
                    f"trial {trial}: cut violated at {y}: "
                    f"{gc} @ y = {gc @ y} < {rc}; base {g} >= {lhs}")
    assert nfound >= 10   # the test exercises real cuts


def test_cmir_infinite_bounds_fail():
    from scipsdp_tpu.models.problem import INF
    g = np.array([1.0, -1.0])
    out = cmir_cut(g, 0.5, np.array([0.0, -INF]), np.array([INF, INF]),
                   np.array([True, True]), np.array([0.5, 0.0]))
    assert out is None   # second variable has no finite bound


def test_multiple_sparse_cuts_disjoint_supports():
    from scipsdp_tpu.ops.cuts import multiple_sparse_cuts
    rng = np.random.default_rng(3)
    n = 12
    # matrix with several negative eigenvalues
    Q = rng.standard_normal((n, n))
    Z = 0.5 * (Q + Q.T) - 2.0 * np.eye(n)
    cuts = multiple_sparse_cuts(Z, sparsity=4, maxncuts=-1, tol=1e-6)
    assert len(cuts) >= 2
    used = np.zeros(n, dtype=bool)
    for v in cuts:
        supp = np.abs(v) > 1e-12
        assert supp.sum() <= 4
        assert not np.any(used & supp)      # disjoint supports
        used |= supp
        # each direction certifies negativity: v^T Z v < 0
        assert v @ Z @ v < -1e-6
