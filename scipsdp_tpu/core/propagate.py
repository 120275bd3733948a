"""Host-side bound propagation.

Activity-based bound tightening over the LP rows (the role SCIP's core
propagation plays for the reference) plus integer-bound rounding.  Used at
the root and at node creation; vectorized numpy fixpoint iteration.

For a row  lhs <= d^T y <= rhs  and variable j with d_j != 0, the residual
activity bounds of the other variables give

    d_j > 0:  y_j >= (lhs - restmax_{-j}) / d_j,  y_j <= (rhs - restmin_{-j}) / d_j
    d_j < 0:  symmetric.

Infinite bounds are handled by *counting* infinite contributions per row
rather than arithmetic with +-1e20 sentinels (naive subtraction suffers
catastrophic absorption: 1e20 + 1 == 1e20 in double precision, silently
dropping finite terms): a residual activity is usable only when no *other*
variable contributes an infinite term.

This derives finite boxes for CBF PSD-variable entries (free scalar
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
    nzmask = D != 0.0
    has_lhs = lhs > -INF / 2
    has_rhs = rhs < INF / 2

    for _ in range(rounds):
        lbinf = lb < -INF / 2
        ubinf = ub > INF / 2
        lbf = np.where(lbinf, 0.0, lb)
        ubf = np.where(ubinf, 0.0, ub)
        # per-(row, var) contribution bounds, infinite ones zeroed + counted
        cmax = pos * ubf[None, :] + neg * lbf[None, :]
        cmin = pos * lbf[None, :] + neg * ubf[None, :]
        infmax = (pos > 0) & ubinf[None, :] | (neg < 0) & lbinf[None, :]
        infmin = (pos > 0) & lbinf[None, :] | (neg < 0) & ubinf[None, :]
        cmax = np.where(infmax, 0.0, cmax)
        cmin = np.where(infmin, 0.0, cmin)
        maxact = cmax.sum(axis=1)
        minact = cmin.sum(axis=1)
        ninfmax = infmax.sum(axis=1)
        ninfmin = infmin.sum(axis=1)
        # residual activities excluding var j; usable iff no OTHER infinite
        rest_max = maxact[:, None] - cmax
        rest_min = minact[:, None] - cmin
        ok_max = (ninfmax[:, None] - infmax) == 0
        ok_min = (ninfmin[:, None] - infmin) == 0

        dpos = D > 0
        dneg = D < 0
        # from lhs:  d_j y_j >= lhs - rest_max
        vlhs = np.where(nzmask & has_lhs[:, None] & ok_max,
                        (lhs[:, None] - rest_max)
                        / np.where(nzmask, D, 1.0), np.nan)
        cand_lb_1 = np.where(dpos, vlhs, -np.inf)
        cand_ub_1 = np.where(dneg, vlhs, np.inf)
        # from rhs:  d_j y_j <= rhs - rest_min
        vrhs = np.where(nzmask & has_rhs[:, None] & ok_min,
                        (rhs[:, None] - rest_min)
                        / np.where(nzmask, D, 1.0), np.nan)
        cand_ub_2 = np.where(dpos, vrhs, np.inf)
        cand_lb_2 = np.where(dneg, vrhs, -np.inf)

        with np.errstate(invalid="ignore"):
            new_lb = np.fmax(np.nanmax(np.where(np.isnan(cand_lb_1),
                                                -np.inf, cand_lb_1), axis=0),
                             np.nanmax(np.where(np.isnan(cand_lb_2),
                                                -np.inf, cand_lb_2), axis=0))
            new_ub = np.fmin(np.nanmin(np.where(np.isnan(cand_ub_1),
                                                np.inf, cand_ub_1), axis=0),
                             np.nanmin(np.where(np.isnan(cand_ub_2),
                                                np.inf, cand_ub_2), axis=0))

        changed = False
        m_lb = new_lb > lb + feastol
        m_ub = new_ub < ub - feastol
        if m_lb.any():
            lb[m_lb] = np.minimum(new_lb[m_lb], INF)
            changed = True
        if m_ub.any():
            ub[m_ub] = np.maximum(new_ub[m_ub], -INF)
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
