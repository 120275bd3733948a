"""One-variable SDP solver.

Port of the reference's special solver for SDPs with a single active
variable (src/sdpi/solveonevarsdp.c: SCIPsolveOneVarSDP:156,
SCIPsolveOneVarSDPDense:370): solve

    min  c * y   s.t.  y * A - A0 >= 0,  lb <= y <= ub

by eigenvalue analysis.  y A - A0 >= 0 defines an interval of feasible y
(possibly empty/half-infinite): with the generalized eigenvalue problem
A0 v = lambda A v restricted to the appropriate subspaces,

  * if A >= 0:  feasible set is  y >= y_min  (y_min = max over constraints)
  * if A <= 0:  y <= y_max
  * indefinite A: an interval [y_min, y_max] (possibly empty)

Implemented robustly by bisection on lambda_min(y A - A0), which is
concave in y — matching the reference's semismooth-Newton robustness goal
with a simpler method suited to batching.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from scipsdp_tpu.models.problem import INF


def _lam_min(y: float, A: np.ndarray, C: np.ndarray) -> float:
    return float(np.linalg.eigvalsh(y * A - C)[0])


def solve_one_var_sdp(A: np.ndarray, C: np.ndarray, c: float,
                      lb: float, ub: float, feastol: float = 1e-6,
                      tol: float = 1e-9) -> Tuple[str, float]:
    """Return (status, y*) with status in {"optimal", "infeasible",
    "unbounded"}.  A, C: (n, n) symmetric; minimize c*y over the feasible
    interval intersected with [lb, ub]."""
    lo = max(lb, -1e12)
    hi = min(ub, 1e12)
    f_lo = _lam_min(lo, A, C)
    f_hi = _lam_min(hi, A, C)
    # lambda_min(y A - C) is concave in y: feasible set is an interval
    if f_lo < -feastol and f_hi < -feastol:
        # check an interior maximizer by golden-section on the concave fn
        a, b = lo, hi
        for _ in range(200):
            m1 = a + 0.382 * (b - a)
            m2 = a + 0.618 * (b - a)
            if _lam_min(m1, A, C) < _lam_min(m2, A, C):
                a = m1
            else:
                b = m2
            if b - a < tol * max(1.0, abs(a)):
                break
        if _lam_min(0.5 * (a + b), A, C) < -feastol:
            return "infeasible", np.nan
        peak = 0.5 * (a + b)
    else:
        peak = lo if f_lo >= -feastol else hi

    def bisect(lo_, hi_, increasing):
        """Boundary of feasibility between an infeasible and feasible end."""
        for _ in range(200):
            mid = 0.5 * (lo_ + hi_)
            if _lam_min(mid, A, C) >= -feastol:
                if increasing:
                    hi_ = mid
                else:
                    lo_ = mid
            else:
                if increasing:
                    lo_ = mid
                else:
                    hi_ = mid
            if hi_ - lo_ < tol * max(1.0, abs(hi_)):
                break
        return 0.5 * (lo_ + hi_)

    # feasible interval endpoints within [lo, hi]
    left = lo if f_lo >= -feastol else bisect(lo, peak, True)
    right = hi if f_hi >= -feastol else bisect(peak, hi, False)

    if c > 0:
        y = left
    elif c < 0:
        y = right
    else:
        y = peak
    if c < 0 and ub >= INF and f_hi >= -feastol:
        return "unbounded", -np.inf
    if c > 0 and lb <= -INF and f_lo >= -feastol:
        return "unbounded", -np.inf
    return "optimal", float(y)
