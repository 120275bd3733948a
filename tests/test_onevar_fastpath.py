"""One-active-variable fast path inside the batched solve
(src/sdpi/sdpi.c:3301-3381: SCIPsdpiSolve routes 1-active-var instances to
SCIPsolveOneVarSDP instead of the back-end IPM).

The pre-pass must (a) decide such instances exactly (statuses/objectives
identical to the IPM), (b) mask them out of the IPM dispatch so they cost
zero iterations, (c) surface rank-1 eigenvector certificates usable by
conflict-cut aggregation.
"""

import numpy as np
import pytest

from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.utils.config import Settings
from scipsdp_tpu.utils.status import SolverResultStatus


@pytest.fixture(scope="module")
def cls_iface():
    prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
    dense = densify(prob)
    return prob, dense, SDPInterface(dense, Settings())


def _deep_boxes(dense, free_j, ints_to=0.0):
    """A node box with every integer fixed and all but one var fixed."""
    lb = dense_lb = np.array(
        [0.0 if b else -10.0 for b in dense.integral])
    ub = np.array([1.0 if b else 10.0 for b in dense.integral])
    lb = lb.copy()
    ub = ub.copy()
    for j in range(dense.nvars):
        if j != free_j:
            v = ints_to if dense.integral[j] else 0.3
            lb[j] = v
            ub[j] = v
    return lb, ub


def test_onevar_matches_ipm_and_skips_iterations(cls_iface):
    prob, dense, iface = cls_iface
    m = dense.nvars
    # free variable: a continuous one (index of first non-integral)
    free_j = int(np.argmax(~dense.integral))
    lb1, ub1 = _deep_boxes(dense, free_j)
    B = 4
    lb = np.tile(lb1, (B, 1))
    ub = np.tile(ub1, (B, 1))
    # vary the fixed pattern slightly per instance
    intidx = np.where(dense.integral)[0]
    for i in range(B):
        j = int(intidx[i % len(intidx)])
        lb[i, j] = 1.0
        ub[i, j] = 1.0

    before = iface.stat_nonevar
    res = iface.solve_batch(lb, ub)
    assert iface.stat_nonevar == before + B
    # all instances decided by the fast path: the IPM retired them at the
    # presolve rung, so the direct dispatch used ZERO iterations
    assert res.iters == 0

    # reference: same boxes through the full IPM (fast path bypassed)
    orig = SDPInterface._onevar_prepass
    SDPInterface._onevar_prepass = lambda self, lb, ub, bmat, cuts: (
        lb, ub, {})
    try:
        ref = iface.solve_batch(lb, ub)
    finally:
        SDPInterface._onevar_prepass = orig

    for i in range(B):
        st, rst = int(res.status[i]), int(ref.status[i])
        if rst == int(SolverResultStatus.OPTIMAL):
            assert st == int(SolverResultStatus.OPTIMAL)
            assert res.objval[i] == pytest.approx(ref.objval[i], abs=1e-4)
            assert res.y[i, free_j] == pytest.approx(ref.y[i, free_j],
                                                     abs=1e-4)
        elif rst == int(SolverResultStatus.INFEASIBLE):
            assert st == int(SolverResultStatus.INFEASIBLE)


def test_onevar_infeasible_certificate():
    """An infeasible 1-var node yields a rank-1 certificate whose
    aggregated row conflicts with the node box."""
    from scipsdp_tpu.models.problem import MISDP, SDPBlock
    # block: y * I(2) - diag(1, -1) >= 0 needs y >= 1; box forces y <= 0.5
    blk = SDPBlock(
        size=2,
        var=np.array([0, 0]), row=np.array([0, 1]), col=np.array([0, 1]),
        val=np.array([1.0, 1.0]),
        const_row=np.array([0, 1]), const_col=np.array([0, 1]),
        const_val=np.array([1.0, -1.0]),
    )
    from scipsdp_tpu.models.problem import LinearConstraints
    prob = MISDP(
        nvars=2, obj=np.array([1.0, 0.0]),
        lb=np.array([0.0, 0.0]), ub=np.array([0.5, 1.0]),
        integral=np.array([False, True]),
        blocks=[blk], lp=LinearConstraints.empty(), name="onevar_inf",
    )
    dense = densify(prob)
    iface = SDPInterface(dense, Settings())
    lb = np.array([[0.0, 1.0]])   # y1 fixed -> single active var y0
    ub = np.array([[0.5, 1.0]])
    res = iface.solve_batch(lb, ub)
    assert int(res.status[0]) == int(SolverResultStatus.INFEASIBLE)
    assert iface.stat_nonevar >= 1
    # certificate: X = v v^T with v the violated eigenvector -> the
    # aggregated row sum_j tr(A_j X) y_j >= tr(A_0 X) must conflict with
    # the box (max over box < lhs)
    g, lhs = iface.conflict_cuts(res)
    gmax = np.where(g[0] > 0, g[0] * ub[0], g[0] * lb[0]).sum()
    assert gmax < lhs[0] - 1e-6


def test_onevar_row_folding():
    """LP rows over the fixed vars fold into bounds on the free one."""
    from scipsdp_tpu.models.problem import MISDP, SDPBlock, LinearConstraints
    blk = SDPBlock(
        size=2,
        var=np.array([0, 0]), row=np.array([0, 1]), col=np.array([0, 1]),
        val=np.array([1.0, 1.0]),
        const_row=np.array([0]), const_col=np.array([0]),
        const_val=np.array([-1.0]),   # y*I - diag(-1, 0) >= 0 <=> y >= 0
    )
    # row: y0 + y1 >= 1.5; y1 fixed at 1 -> y0 >= 0.5
    rows = [(np.array([0, 1]), np.array([1.0, 1.0]), 1.5, np.inf)]
    prob = MISDP(
        nvars=2, obj=np.array([1.0, 0.0]),
        lb=np.array([0.0, 0.0]), ub=np.array([10.0, 1.0]),
        integral=np.array([False, True]),
        blocks=[blk], lp=LinearConstraints.from_rows(rows), name="ov_rows",
    )
    dense = densify(prob)
    iface = SDPInterface(dense, Settings())
    res = iface.solve_batch(np.array([[0.0, 1.0]]),
                            np.array([[10.0, 1.0]]))
    assert int(res.status[0]) == int(SolverResultStatus.OPTIMAL)
    assert res.objval[0] == pytest.approx(0.5, abs=1e-6)
    assert res.y[0, 0] == pytest.approx(0.5, abs=1e-6)
