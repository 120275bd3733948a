"""Conflict-constraint tests (computeConflictCut / generateConflictCons,
relax_sdp.c:954,1424)."""

import numpy as np

from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.problem import (INF, LinearConstraints, MISDP,
                                        SDPBlock, densify)
from scipsdp_tpu.utils.config import BBSettings, Settings
from scipsdp_tpu.utils.status import SolverResultStatus


def _prob():
    """min y0 s.t. y0 * I - I >= 0 (2x2):  y0 >= 1, box handled per node."""
    blk = SDPBlock(size=2, var=[0, 0], row=[0, 1], col=[0, 1],
                   val=[1.0, 1.0],
                   const_row=[0, 1], const_col=[0, 1], const_val=[1.0, 1.0])
    return MISDP(nvars=1, obj=np.array([1.0]), lb=np.zeros(1),
                 ub=np.full(1, 2.0), integral=np.zeros(1, bool),
                 blocks=[blk], lp=LinearConstraints.empty(), name="conf")


def test_farkas_conflict_row_excludes_infeasible_box():
    iface = SDPInterface(densify(_prob()), Settings())
    # node box [0, 0.5]: infeasible (needs y0 >= 1)
    res = iface.solve_batch(np.array([[0.0]]), np.array([[0.5]]))
    assert res.status[0] == int(SolverResultStatus.INFEASIBLE)
    G, lhs = iface.conflict_cuts(res)
    g = G[0]
    # max of g @ y over the node box must fall short of lhs: the row
    # certifies the box infeasible
    boxmax = float(np.sum(np.where(g > 0, g * 0.5, g * 0.0)))
    assert boxmax < lhs[0] - 1e-6
    # and the row is globally valid: satisfied at the feasible point y0=1.5
    assert g[0] * 1.5 >= lhs[0] - 1e-6


def test_feasible_node_conflict_row_is_supporting():
    iface = SDPInterface(densify(_prob()), Settings())
    res = iface.solve_batch(np.array([[0.0]]), np.array([[2.0]]))
    assert res.status[0] == int(SolverResultStatus.OPTIMAL)
    G, lhs = iface.conflict_cuts(res)
    # valid at the node optimum itself (supporting hyperplane)
    assert G[0] @ res.y[0] >= lhs[0] - 1e-5
    # and at other feasible points
    for yv in (1.0, 1.5, 2.0):
        assert G[0] @ np.array([yv]) >= lhs[0] - 1e-5


def test_bb_with_conflicts_still_correct():
    from scipsdp_tpu.core.branchbound import solve_misdp
    # integer version; conflictconss default on
    blk = SDPBlock(size=2, var=[0, 1], row=[0, 1], col=[0, 1],
                   val=[1.0, 1.0],
                   const_row=[0, 1], const_col=[0, 1],
                   const_val=[1.5, 1.5])
    prob = MISDP(nvars=2, obj=np.array([1.0, 1.0]), lb=np.zeros(2),
                 ub=np.full(2, 3.0), integral=np.ones(2, bool),
                 blocks=[blk], lp=LinearConstraints.empty(), name="confbb")
    res = solve_misdp(prob, Settings(bb=BBSettings(batch_size=4)))
    assert abs(res.objval - 4.0) < 1e-4   # y = (2, 2)
