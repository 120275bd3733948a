"""Vectorized branch-and-bound for MISDPs.

This layer owns the tree loop that SCIP provides for the reference
(SURVEY.md section 1: "The TPU-native build must own the B&B loop itself").
Design: a *host-side* best-first frontier (the reference's re-defaulted node
selection, scipsdpdefplugins.c:152-158 — best-first because SDP warmstarts
are weak) and *device-side batched* relaxation solves of many open nodes per
step — the TPU analog of SCIP's concurrent-solver portfolio
(SCIPsdpiClone, sdpi.c:2144).

Node relaxations differ only in variable bounds, so one ``SDPInterface``
instance serves every node of a problem; a step pops up to ``batch_size``
nodes, solves them in one batched IPM call, then applies the calcRelax
outcome rules (relax_sdp.c:4205-4346): cutoff on infeasibility / bound,
incumbent update on integral relaxation solutions, rounding heuristic
(heur_sdpfracround.c analog), and branching (core/branching.py).

Indicator constraints (binvar = 1 => slackvar = 0) are enforced by bound
propagation at node creation, mirroring the slack-variable translation of
SCIPcreateConsIndicatorLinCons (reader_sdpa.c:1195-1252); enforcement
branches on undecided indicator variables.
"""

from __future__ import annotations

import dataclasses
import heapq
import itertools
import time
from typing import List, Optional, Tuple

import numpy as np

from scipsdp_tpu.core.branching import select_branch_var
from scipsdp_tpu.core.feascheck import check_points
from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.problem import INF, MISDP, densify
from scipsdp_tpu.utils.config import Settings
from scipsdp_tpu.utils.status import SolveStatus, SolverResultStatus


@dataclasses.dataclass
class BBStats:
    nodes: int = 0
    relax_solves: int = 0
    ipm_iterations: int = 0
    solver_calls: int = 0
    npenalty: int = 0
    nunsolved: int = 0
    heur_found: int = 0
    wall_time: float = 0.0


@dataclasses.dataclass
class BBResult:
    status: SolveStatus
    objval: Optional[float]        # external (original-sense) objective
    best_y: Optional[np.ndarray]   # incumbent solution (original vars)
    dual_bound: float              # external-sense proven bound
    gap: float
    stats: BBStats

    def __repr__(self):
        return (f"BBResult(status={self.status.name}, objval={self.objval}, "
                f"bound={self.dual_bound}, nodes={self.stats.nodes})")


class _Node:
    __slots__ = ("lb", "ub", "bound", "depth")

    def __init__(self, lb, ub, bound, depth):
        self.lb = lb
        self.ub = ub
        self.bound = bound
        self.depth = depth


def _apply_indicator_propagation(prob: MISDP, lb: np.ndarray, ub: np.ndarray):
    """binvar fixed to 1 => slack forced to 0 (indicator semantics)."""
    for link in prob.indicators:
        if lb[link.binvar] >= 0.5:
            ub[link.slackvar] = min(ub[link.slackvar], 0.0)


def _violated_indicator(prob: MISDP, y: np.ndarray, feastol: float) -> int:
    """Return the binvar of a violated indicator link (binvar ~ 1 but slack
    positive), or -1.  This is the enforcement role of SCIP's
    cons_indicator: integral solutions violating an indicator must not be
    accepted; we enforce by branching on the indicator variable."""
    for link in prob.indicators:
        if y[link.binvar] >= 0.5 and y[link.slackvar] > feastol:
            return link.binvar
    return -1


def solve_misdp(prob: MISDP, settings: Optional[Settings] = None,
                log: bool = False) -> BBResult:
    """Solve a MISDP by nonlinear branch-and-bound with batched SDP
    relaxations (the reference's default mode, misc/solvesdps = 1)."""
    settings = settings or Settings()
    bb = settings.bb
    feastol = bb.feastol
    t0 = time.time()

    dense = densify(prob)
    iface = SDPInterface(dense, settings)
    m = prob.nvars
    integral = prob.integral
    obj = prob.obj

    stats = BBStats()
    incumbent_val = np.inf     # internal (min) objective of best solution
    incumbent_y: Optional[np.ndarray] = None

    root_lb = prob.lb.copy()
    root_ub = prob.ub.copy()
    _apply_indicator_propagation(prob, root_lb, root_ub)

    counter = itertools.count()
    frontier: List[Tuple[float, int, _Node]] = []
    heapq.heappush(frontier, (-np.inf, next(counter),
                              _Node(root_lb, root_ub, -np.inf, 0)))

    unbounded = False
    hit_limit: Optional[SolveStatus] = None

    while frontier:
        if stats.nodes >= bb.node_limit:
            hit_limit = SolveStatus.NODE_LIMIT
            break
        if time.time() - t0 > bb.time_limit:
            hit_limit = SolveStatus.TIME_LIMIT
            break

        # pop up to batch_size best-bound nodes
        batch: List[_Node] = []
        while frontier and len(batch) < bb.batch_size:
            _, _, node = heapq.heappop(frontier)
            if node.bound >= incumbent_val - 1e-9:      # late bound pruning
                continue
            batch.append(node)
        if not batch:
            break

        B = bb.batch_size
        lb = np.empty((B, m))
        ub = np.empty((B, m))
        for i in range(B):
            if i < len(batch):
                lb[i] = batch[i].lb
                ub[i] = batch[i].ub
            else:
                lb[i] = 1.0   # dummy slot: bound conflict, presolved away
                ub[i] = 0.0

        res = iface.solve_batch(lb, ub)
        stats.nodes += len(batch)
        stats.relax_solves += 1
        stats.ipm_iterations += res.iters
        stats.solver_calls += res.nsolves
        stats.npenalty += res.npenalty

        # batched rounding heuristic on all usable relaxation solutions
        # (heur_sdpfracround.c: round by fractionality, check feasibility)
        if bb.heuristic_fracround:
            yr = res.y.copy()
            yr[:, integral] = np.round(yr[:, integral])
            yr = np.clip(yr, lb, ub)
            # indicator semantics: binvar rounded to 1 forces slack to 0
            for link in prob.indicators:
                on = yr[:, link.binvar] >= 0.5
                yr[on, link.slackvar] = 0.0
            feas, _ = check_points(iface.data, yr, lb, ub, feastol=feastol)
            feas = np.asarray(feas)
        else:
            feas = np.zeros(B, dtype=bool)
            yr = res.y

        for i, node in enumerate(batch):
            st = res.status[i]
            if st in (SolverResultStatus.INFEASIBLE,
                      SolverResultStatus.PRESOLVED_INFEASIBLE):
                continue  # cutoff
            if st == SolverResultStatus.UNBOUNDED:
                unbounded = True
                continue
            if st == SolverResultStatus.FAILED:
                stats.nunsolved += 1
                bound = node.bound  # no new information; keep parent bound
                y = None
            else:
                bound = float(res.objval[i])
                y = res.y[i]

            if bound >= incumbent_val - 1e-9 + bb.gaplimit * abs(incumbent_val):
                continue  # bound pruning

            # heuristic incumbent
            if y is not None and feas[i]:
                val = float(obj @ yr[i])
                if val < incumbent_val - 1e-12:
                    incumbent_val = val
                    incumbent_y = yr[i].copy()
                    stats.heur_found += 1

            if st == SolverResultStatus.PRESOLVED_OPTIMAL:
                # all vars fixed & feasible: leaf with known value
                if bound < incumbent_val - 1e-12:
                    incumbent_val = bound
                    incumbent_y = 0.5 * (node.lb + node.ub)
                continue

            # integrality check of the relaxation solution
            enforce_ind = -1
            if y is not None and st == SolverResultStatus.OPTIMAL:
                frac = np.abs(y[integral] - np.round(y[integral]))
                if frac.size == 0 or np.max(frac) <= feastol:
                    enforce_ind = _violated_indicator(prob, y, feastol)
                    if enforce_ind < 0:
                        if bound < incumbent_val - 1e-12:
                            incumbent_val = bound
                            incumbent_y = y.copy()
                        continue

            # branch (enforcement branching on a violated indicator first)
            if enforce_ind >= 0:
                j = enforce_ind
            elif y is not None:
                j = select_branch_var(y, obj, integral, feastol,
                                      bb.branching_rule)
            else:
                j = -1
            if enforce_ind >= 0:
                # binvar is integral at 1: children binvar<=0 / binvar>=1
                # (the latter propagates slack = 0)
                split = 0.0
            elif j < 0:
                # no fractional candidate but couldn't accept (FAILED or
                # BOUND_ONLY): branch on any unfixed integer variable
                unfixed = np.where(integral & (node.ub - node.lb > feastol))[0]
                if unfixed.size == 0:
                    continue  # nothing to do
                j = int(unfixed[0])
                split = np.floor(0.5 * (node.lb[j] + node.ub[j]))
            else:
                split = np.floor(y[j])

            lb1, ub1 = node.lb.copy(), node.ub.copy()
            lb2, ub2 = node.lb.copy(), node.ub.copy()
            ub1[j] = split
            lb2[j] = split + 1.0
            for clb, cub in ((lb1, ub1), (lb2, ub2)):
                _apply_indicator_propagation(prob, clb, cub)
                if np.all(clb <= cub + feastol):
                    heapq.heappush(
                        frontier,
                        (bound, next(counter), _Node(clb, cub, bound,
                                                     node.depth + 1)),
                    )

        if log:
            fb = frontier[0][0] if frontier else incumbent_val
            print(f"nodes={stats.nodes} open={len(frontier)} "
                  f"incumbent={incumbent_val:.6g} bound={fb:.6g}")

    stats.wall_time = time.time() - t0

    # assemble result (external objective sense)
    if unbounded and incumbent_y is None:
        return BBResult(SolveStatus.UNBOUNDED, None, None,
                        -np.inf * prob.objsense, np.inf, stats)

    dual_bound_internal = incumbent_val
    if frontier:
        dual_bound_internal = min(node.bound for _, _, node in frontier)
    if hit_limit is not None:
        status = hit_limit
        objval = (prob.external_objval(incumbent_val)
                  if incumbent_y is not None else None)
        gap = (abs(incumbent_val - dual_bound_internal)
               / max(1e-9, abs(incumbent_val))
               if incumbent_y is not None else np.inf)
        return BBResult(status, objval,
                        incumbent_y[:m] if incumbent_y is not None else None,
                        prob.external_objval(dual_bound_internal), gap, stats)

    if incumbent_y is None:
        return BBResult(SolveStatus.INFEASIBLE, None, None,
                        prob.external_objval(np.inf), 0.0, stats)

    return BBResult(
        SolveStatus.OPTIMAL,
        prob.external_objval(incumbent_val),
        incumbent_y[:m],
        prob.external_objval(incumbent_val),
        0.0,
        stats,
    )
