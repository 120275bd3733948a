"""SDPI contract tests.

Pytest port of the reference's fake-backend-free L2 contract suite
(unittests/src/checksdpi.c, tests 1-12): tiny hand-built LPs/SDPs driven
through the batched interface, asserting statuses and optimal values.
Status naming maps the reference's (primal, dual) pairs to our single
dual-side status: SCIPfeas->OPTIMAL, dual SCIPinfeas->INFEASIBLE,
dual SCIPunbounded->UNBOUNDED.
"""

import numpy as np
import pytest

from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.problem import (
    INF,
    LinearConstraints,
    MISDP,
    SDPBlock,
    densify,
)
from scipsdp_tpu.utils.status import SolverResultStatus

TOL = 1e-4


def make_lp(obj, lb, ub, rows):
    n = len(obj)
    return MISDP(
        nvars=n,
        obj=np.array(obj, dtype=float),
        lb=np.array(lb, dtype=float),
        ub=np.array(ub, dtype=float),
        integral=np.zeros(n, dtype=bool),
        blocks=[],
        lp=LinearConstraints.from_rows(rows),
        name="lp",
    )


def solve_single(prob):
    iface = SDPInterface(densify(prob))
    res = iface.solve_batch(prob.lb[None, :], prob.ub[None, :])
    return res


def test1_lp_feasible():
    """min -3x1 - x2, 2x1+x2<=10, x1+3x2<=15, x>=0 -> opt -15 at (5,0)."""
    prob = make_lp(
        [-3, -1], [0, 0], [INF, INF],
        [([0, 1], [2, 1], -INF, 10), ([0, 1], [1, 3], -INF, 15)],
    )
    res = solve_single(prob)
    assert res.status[0] == SolverResultStatus.OPTIMAL
    assert abs(res.objval[0] - (-15.0)) < TOL
    np.testing.assert_allclose(res.y[0], [5.0, 0.0], atol=1e-3)


def test2_lp_unbounded():
    """Same rows but x free -> unbounded."""
    prob = make_lp(
        [-3, -1], [-INF, -INF], [INF, INF],
        [([0, 1], [2, 1], -INF, 10), ([0, 1], [1, 3], -INF, 15)],
    )
    res = solve_single(prob)
    assert res.status[0] == SolverResultStatus.UNBOUNDED


def test3_lp_infeasible():
    """min 10y1+15y2, 2y1+y2==3, y1+3y2==1, y>=0 -> infeasible."""
    prob = make_lp(
        [10, 15], [0, 0], [INF, INF],
        [([0, 1], [2, 1], 3, 3), ([0, 1], [1, 3], 1, 1)],
    )
    res = solve_single(prob)
    assert res.status[0] == SolverResultStatus.INFEASIBLE


def test4_lp_both_infeasible():
    """min -x1-x2, x1-x2<=0, -x1+x2<=-1, x free -> (dual) infeasible."""
    prob = make_lp(
        [-1, -1], [-INF, -INF], [INF, INF],
        [([0, 1], [1, -1], -INF, 0), ([0, 1], [-1, 1], -INF, -1)],
    )
    res = solve_single(prob)
    assert res.status[0] == SolverResultStatus.INFEASIBLE


def test5_lp_fixed_feasible():
    """All variables fixed to 0, rows satisfied -> feasible, obj 0."""
    prob = make_lp(
        [-3, -1], [0, 0], [0, 0],
        [([0, 1], [2, 1], -INF, 10), ([0, 1], [1, 3], -INF, 15)],
    )
    res = solve_single(prob)
    assert res.status[0] in (SolverResultStatus.PRESOLVED_OPTIMAL,
                             SolverResultStatus.OPTIMAL)
    assert abs(res.objval[0]) < TOL


def test6_lp_fixed_infeasible():
    """x fixed to (4,3): 2*4+3=11 > 10 -> infeasible."""
    prob = make_lp(
        [-3, -1], [4, 3], [4, 3],
        [([0, 1], [2, 1], -INF, 10), ([0, 1], [1, 3], -INF, 15)],
    )
    res = solve_single(prob)
    assert res.status[0] in (SolverResultStatus.PRESOLVED_INFEASIBLE,
                             SolverResultStatus.INFEASIBLE)


def test7_conflicting_bounds():
    """lb > ub -> infeasible (bound-conflict shortcut, sdpi.c:3194)."""
    prob = make_lp(
        [-3, -1], [4, 3], [2, 3],
        [([0, 1], [2, 1], -INF, 10), ([0, 1], [1, 3], -INF, 15)],
    )
    res = solve_single(prob)
    assert res.status[0] in (SolverResultStatus.PRESOLVED_INFEASIBLE,
                             SolverResultStatus.INFEASIBLE)


def _sdp_block_diag_vars():
    """[x1 0; 0 x2] >= 0 as an SDP block."""
    return SDPBlock(
        size=2,
        var=[0, 1], row=[0, 1], col=[0, 1], val=[1.0, 1.0],
        const_row=[], const_col=[], const_val=[],
    )


def test9_sdp_infeasible():
    """-1<=x<=1, [x1 1; 1 0.75 x2] >= 0 -> x1*x2>=4/3 impossible."""
    blk = SDPBlock(
        size=2,
        var=[0, 1], row=[0, 1], col=[0, 1], val=[1.0, 0.75],
        const_row=[1], const_col=[0], const_val=[-1.0],
    )
    prob = MISDP(
        nvars=2, obj=np.array([-1.0, 0.0]),
        lb=np.array([-1.0, -1.0]), ub=np.array([1.0, 1.0]),
        integral=np.zeros(2, bool), blocks=[blk],
        lp=LinearConstraints.empty(), name="t9",
    )
    res = solve_single(prob)
    assert res.status[0] == SolverResultStatus.INFEASIBLE


def test10_sdp_feasible():
    """min -x1-x2, -1<=x<=1, diag(x1,x2)>=0 -> opt -2 at (1,1)."""
    prob = MISDP(
        nvars=2, obj=np.array([-1.0, -1.0]),
        lb=np.array([-1.0, -1.0]), ub=np.array([1.0, 1.0]),
        integral=np.zeros(2, bool), blocks=[_sdp_block_diag_vars()],
        lp=LinearConstraints.empty(), name="t10",
    )
    res = solve_single(prob)
    assert res.status[0] == SolverResultStatus.OPTIMAL
    assert abs(res.objval[0] - (-2.0)) < TOL
    np.testing.assert_allclose(res.y[0], [1.0, 1.0], atol=1e-3)


def test11_sdp_one_var():
    """min x1, I*x1 - [1 2; 2 4] >= 0 -> opt 5 (largest eigenvalue)."""
    blk = SDPBlock(
        size=2,
        var=[0, 0], row=[0, 1], col=[0, 1], val=[1.0, 1.0],
        const_row=[0, 1, 1], const_col=[0, 0, 1], const_val=[1.0, 2.0, 4.0],
    )
    prob = MISDP(
        nvars=1, obj=np.array([1.0]),
        lb=np.array([-INF]), ub=np.array([INF]),
        integral=np.zeros(1, bool), blocks=[blk],
        lp=LinearConstraints.empty(), name="t11",
    )
    res = solve_single(prob)
    assert res.status[0] == SolverResultStatus.OPTIMAL
    assert abs(res.objval[0] - 5.0) < TOL
    assert abs(res.y[0, 0] - 5.0) < 1e-3


def test12_sdp_fixed_infeasible():
    """Same as test11 but x1 fixed to 0 -> infeasible (lam_min(-A0) = -5)."""
    blk = SDPBlock(
        size=2,
        var=[0, 0], row=[0, 1], col=[0, 1], val=[1.0, 1.0],
        const_row=[0, 1, 1], const_col=[0, 0, 1], const_val=[1.0, 2.0, 4.0],
    )
    prob = MISDP(
        nvars=1, obj=np.array([1.0]),
        lb=np.array([0.0]), ub=np.array([0.0]),
        integral=np.zeros(1, bool), blocks=[blk],
        lp=LinearConstraints.empty(), name="t12",
    )
    res = solve_single(prob)
    assert res.status[0] == SolverResultStatus.PRESOLVED_INFEASIBLE


def test_batched_mixed_statuses():
    """One batch with feasible, fixed-feasible, and conflicting nodes —
    the vectorized analog of the reference's concurrent-solver portfolio."""
    prob = make_lp(
        [-3, -1], [0, 0], [INF, INF],
        [([0, 1], [2, 1], -INF, 10), ([0, 1], [1, 3], -INF, 15)],
    )
    iface = SDPInterface(densify(prob))
    lb = np.array([[0.0, 0.0], [0.0, 0.0], [4.0, 3.0]])
    ub = np.array([[INF, INF], [0.0, 0.0], [2.0, 3.0]])
    res = iface.solve_batch(lb, ub)
    assert res.status[0] == SolverResultStatus.OPTIMAL
    assert abs(res.objval[0] - (-15.0)) < TOL
    assert res.status[1] in (SolverResultStatus.PRESOLVED_OPTIMAL,
                             SolverResultStatus.OPTIMAL)
    assert abs(res.objval[1]) < TOL
    assert res.status[2] in (SolverResultStatus.PRESOLVED_INFEASIBLE,
                             SolverResultStatus.INFEASIBLE)


def test_primal_bound_multipliers():
    """test1's expected primal lb-multiplier values (0, 0.5): the dual
    fixing data used by prop_sdpredcost (SCIPsdpiGetPrimalBoundVars)."""
    prob = make_lp(
        [-3, -1], [0, 0], [INF, INF],
        [([0, 1], [2, 1], -INF, 10), ([0, 1], [1, 3], -INF, 15)],
    )
    res = solve_single(prob)
    np.testing.assert_allclose(res.xlb[0], [0.0, 0.5], atol=1e-3)
    # rhs rows were converted to >=-rows with sign -1; their multipliers
    # are the reference's exp_primalrhsvals (1.5, 0)
    np.testing.assert_allclose(res.xl[0], [1.5, 0.0], atol=1e-3)


def test_root_relaxations_of_instances(instances_dir):
    """Root-node relaxation solves of the shipped instances give finite
    lower bounds below the known MISDP optima (BASELINE.md)."""
    import os
    from scipsdp_tpu.models.io import read_problem

    known = {
        "example_small.dat-s": -8.0,
        "example_inf.dat-s": None,       # MISDP-infeasible, relaxation feasible
        "example_tightenmatrices.dat-s": -9.0,
    }
    for name, opt in known.items():
        prob = read_problem(os.path.join(instances_dir, name))
        iface = SDPInterface(densify(prob))
        res = iface.solve_batch(prob.lb[None, :], prob.ub[None, :])
        assert res.status[0] == SolverResultStatus.OPTIMAL, name
        if opt is not None:
            assert res.objval[0] <= opt + 1e-5, name


def test_fused_executable_shared_across_interfaces():
    """Interfaces with identical trace signatures must share ONE jitted
    executable (the warmstartproject=4 rounding problems create one
    interface per node and must not re-compile)."""
    import numpy as np

    from scipsdp_tpu.core.sdpi import SDPInterface
    from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP, densify

    def lp(name, c0):
        return MISDP(
            nvars=2, obj=np.array([c0, 1.0]),
            lb=np.zeros(2), ub=np.ones(2),
            integral=np.zeros(2, bool), blocks=[],
            lp=LinearConstraints.from_rows([([0, 1], [1.0, 1.0], 1.0, INF)]),
            name=name,
        )

    a = SDPInterface(densify(lp("a", 1.0)))
    b = SDPInterface(densify(lp("b", 2.0)))   # different DATA, same trace
    assert a._fused is b._fused
    ra = a.solve_batch(np.zeros((1, 2)), np.ones((1, 2)))
    rb = b.solve_batch(np.zeros((1, 2)), np.ones((1, 2)))
    assert abs(ra.objval[0] - 1.0) < 1e-4     # min y0+y1 st sum >= 1
    assert abs(rb.objval[0] - 1.0) < 1e-4     # min 2y0+y1 -> y1=1
