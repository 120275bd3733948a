"""Host-side bound propagation.

Activity-based bound tightening over the LP rows (the role SCIP's core
propagation plays for the reference) plus integer-bound rounding.  Used at
the root and at node creation; cheap numpy fixpoint iteration.

For a row  lhs <= d^T y <= rhs  and variable j with d_j != 0, the residual
activity bounds of the other variables give

    d_j > 0:  y_j >= (lhs - maxact_{-j}) / d_j,   y_j <= (rhs - minact_{-j}) / d_j
    d_j < 0:  symmetric.

This is what derives finite boxes for CBF PSD-variable entries (free scalar
variables constrained only through rows), which the rank-1 secant cuts and
spatial branching need (core/rank1.py).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from scipsdp_tpu.models.problem import INF, MISDP


def tighten_bounds(prob: MISDP, lb: np.ndarray, ub: np.ndarray,
                   rounds: int = 5, feastol: float = 1e-9
                   ) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Return (lb', ub', conflict). Does not modify inputs."""
    lb = lb.copy()
    ub = ub.copy()
    D = prob.lp.dense(prob.nvars)       # (p, m)
    lhs = prob.lp.lhs
    rhs = prob.lp.rhs
    if D.shape[0] == 0:
        return lb, ub, False
    pos = np.maximum(D, 0.0)
    neg = np.minimum(D, 0.0)

    for _ in range(rounds):
        changed = False
        lbc = np.clip(lb, -INF, INF)
        ubc = np.clip(ub, -INF, INF)
        # min/max activity per row (inf-safe: use +-INF sentinels)
        minact = pos @ lbc + neg @ ubc
        maxact = pos @ ubc + neg @ lbc
        for i in range(D.shape[0]):
            d = D[i]
            nz = np.nonzero(d)[0]
            for j in nz:
                dj = d[j]
                term_min = pos[i, j] * lbc[j] + neg[i, j] * ubc[j]
                term_max = pos[i, j] * ubc[j] + neg[i, j] * lbc[j]
                rest_min = minact[i] - term_min
                rest_max = maxact[i] - term_max
                if lhs[i] > -INF and rest_max < INF / 2:
                    # d_j y_j >= lhs - rest_max
                    v = (lhs[i] - rest_max) / dj
                    if dj > 0 and v > lb[j] + feastol:
                        lb[j] = v
                        changed = True
                    elif dj < 0 and v < ub[j] - feastol:
                        ub[j] = v
                        changed = True
                if rhs[i] < INF and rest_min > -INF / 2:
                    v = (rhs[i] - rest_min) / dj
                    if dj > 0 and v < ub[j] - feastol:
                        ub[j] = v
                        changed = True
                    elif dj < 0 and v > lb[j] + feastol:
                        lb[j] = v
                        changed = True
        # integer rounding
        ints = prob.integral
        lb[ints] = np.where(lb[ints] > -INF / 2, np.ceil(lb[ints] - 1e-6),
                            lb[ints])
        ub[ints] = np.where(ub[ints] < INF / 2, np.floor(ub[ints] + 1e-6),
                            ub[ints])
        if np.any(lb > ub + 1e-6):
            return lb, ub, True
        if not changed:
            break
    return lb, ub, False
