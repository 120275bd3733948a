"""One-var solver certificates + Lanczos path (solveonevarsdp.c:127,156;
arpack_interface.c:237)."""

import numpy as np

from scipsdp_tpu.models.problem import INF
from scipsdp_tpu.ops.onevar import (lam_min_lanczos, solve_one_var_sdp)


def _sym(rng, n):
    M = rng.standard_normal((n, n))
    return 0.5 * (M + M.T)


def test_lanczos_matches_eigh():
    rng = np.random.default_rng(0)
    for n in (50, 200, 400):
        M = _sym(rng, n)
        lam, v = lam_min_lanczos(M)
        lam_ref = np.linalg.eigvalsh(M)[0]
        assert abs(lam - lam_ref) < 1e-8 * max(1.0, abs(lam_ref))
        # Ritz vector residual
        assert np.linalg.norm(M @ v - lam * v) < 1e-6 * np.linalg.norm(M)


def test_certificate_at_boundary_optimum():
    """min y s.t. y*I - diag(d) >= 0: optimum y* = max(d); the certificate
    eigenvector is the max-d coordinate, supergradient v^T A v = 1."""
    d = np.array([0.3, 2.0, -1.0])
    A = np.eye(3)
    C = np.diag(d)
    st, y, cert = solve_one_var_sdp(A, C, 1.0, -10.0, 10.0,
                                    with_certificate=True)
    assert st == "optimal"
    assert abs(y - 2.0) < 1e-6
    assert abs(cert.lam) < 1e-6                 # active boundary
    assert abs(abs(cert.eigvec[1]) - 1.0) < 1e-6
    assert abs(cert.supergrad - 1.0) < 1e-6


def test_certificate_infeasible():
    """y*A - C with A = 0, C = I: lam_min = -1 for all y -> infeasible,
    certificate carries the negative eigenvalue."""
    A = np.zeros((2, 2))
    C = np.eye(2)
    st, y, cert = solve_one_var_sdp(A, C, 1.0, -1.0, 1.0,
                                    with_certificate=True)
    assert st == "infeasible"
    assert cert.lam < -1e-6
    assert abs(cert.supergrad) < 1e-9           # v^T A v = 0: flat


def test_certificate_unbounded():
    """min -y s.t. y >= 1 with free upper bound: unbounded below."""
    A = np.eye(2)
    C = np.eye(2)
    st, y, cert = solve_one_var_sdp(A, C, -1.0, 0.0, INF,
                                    with_certificate=True)
    assert st == "unbounded"
    assert cert.supergrad > 0.5                 # lam_min strictly increasing


def test_large_one_var_uses_lanczos_consistently():
    """Above the Lanczos switchover the solver must agree with the dense
    path (same problem below the threshold via padding symmetry)."""
    rng = np.random.default_rng(1)
    n = 220
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    d = np.linspace(0.1, 3.0, n)
    C = Q @ np.diag(d) @ Q.T
    A = np.eye(n)
    st, y = solve_one_var_sdp(A, C, 1.0, -100.0, 100.0)
    assert st == "optimal"
    assert abs(y - d.max()) < 1e-5
