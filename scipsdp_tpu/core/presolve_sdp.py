"""Problem-level SDP presolve transformations.

Ports of cons_sdp.c's presolving routines that rewrite the problem once
before solving (consPresolSdp:7314):

* ``move_1x1_blocks``   — 1x1 SDP blocks become LP rows
                          (move_1x1_blocks_to_lp, cons_sdp.c:3790);
* ``diag_ge_zero_rows`` — rows  sum_j (A_j)_kk y_j >= (A_0)_kk  per
                          diagonal entry (diagGEzero, cons_sdp.c:2209;
                          default off like DEFAULT_DIAGGEZEROCUTS);
* ``two_minor_lin_rows``— eigenvector cuts with v = e_s - e_t:
                          A(y)_ss + A(y)_tt - 2 A(y)_st >= 0
                          (addTwoMinorLinConstraints, cons_sdp.c:2642;
                          default off like DEFAULT_TWOMINORLINCONSS).

All produce valid linear rows implied by the PSD constraints, so they can
only tighten LP-mode relaxations and propagation.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP


def _append_rows(lp: LinearConstraints, rows) -> LinearConstraints:
    if not rows:
        return lp
    old = [
        (list(lp.ind[lp.beg[i]:lp.beg[i + 1]]),
         list(lp.val[lp.beg[i]:lp.beg[i + 1]]), lp.lhs[i], lp.rhs[i])
        for i in range(lp.nrows)
    ]
    return LinearConstraints.from_rows(old + rows)


def move_1x1_blocks(prob: MISDP) -> MISDP:
    """1x1 SDP blocks  sum_j a_j y_j - a_0 >= 0  -> LP rows."""
    keep = []
    rows = []
    for blk in prob.blocks:
        if blk.size == 1:
            A = blk.dense_coeff(prob.nvars)[:, 0, 0]
            c = blk.dense_const()[0, 0]
            nz = np.nonzero(A)[0]
            rows.append((list(nz), list(A[nz]), float(c), INF))
        else:
            keep.append(blk)
    if not rows:
        return prob
    return dataclasses.replace(prob, blocks=keep,
                               lp=_append_rows(prob.lp, rows))


def diag_ge_zero_rows(prob: MISDP) -> List[tuple]:
    """diagGEzero rows for every diagonal entry of every block."""
    rows = []
    for blk in prob.blocks:
        A = blk.dense_coeff(prob.nvars)
        C = blk.dense_const()
        for k in range(blk.size):
            coefs = A[:, k, k]
            nz = np.nonzero(coefs)[0]
            if len(nz):
                rows.append((list(nz), list(coefs[nz]), float(C[k, k]), INF))
    return rows


def two_minor_lin_rows(prob: MISDP) -> List[tuple]:
    """v = e_s - e_t eigenvector rows per off-diagonal pair."""
    rows = []
    for blk in prob.blocks:
        A = blk.dense_coeff(prob.nvars)
        C = blk.dense_const()
        for s in range(blk.size):
            for t in range(s):
                coefs = A[:, s, s] + A[:, t, t] - 2.0 * A[:, s, t]
                rhs = C[s, s] + C[t, t] - 2.0 * C[s, t]
                nz = np.nonzero(coefs)[0]
                if len(nz):
                    rows.append((list(nz), list(coefs[nz]), float(rhs), INF))
    return rows


def presolve_problem(prob: MISDP, settings) -> MISDP:
    """Apply the enabled problem-level transformations."""
    pres = settings.presolve
    if pres.move_1x1_blocks:
        prob = move_1x1_blocks(prob)
    extra = []
    if pres.diaggezerocuts:
        extra += diag_ge_zero_rows(prob)
    if pres.twominorlinconss:
        extra += two_minor_lin_rows(prob)
    if getattr(settings, "use_symmetry", False):
        from scipsdp_tpu.core.symmetry import symmetry_breaking_rows
        extra += symmetry_breaking_rows(prob)
    if extra:
        prob = dataclasses.replace(prob, lp=_append_rows(prob.lp, extra))
    return prob
