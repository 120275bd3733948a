"""In-tree propagation + conflict analysis (VERDICT round-1 item 6).

The reference runs SDP-structural propagation at EVERY node
(consPropSdp, cons_sdp.c:7046) and performs conflict analysis on
propagation-derived infeasibility (cons_sdp.c:4793,5138).  Here:
``_Solver.propagate_node`` applies the matrix-view propagators at
``prop_freq`` cadence, and ``_Solver.learn_nogood`` turns a
propagation-infeasible child's binary fixings into a globally valid
no-good row (measured on example_MkP: 52 -> 48 nodes with prop_freq=1).
"""

import numpy as np

from scipsdp_tpu.core.branchbound import _Solver
from scipsdp_tpu.models.problem import (
    INF, LinearConstraints, MISDP, SDPBlock)
from scipsdp_tpu.utils.config import BBSettings, PresolveSettings, Settings

# isolate the NODE-time propagators from presolve-generated rows (the
# 2x2-minor variable-bound presolve can derive the same tightenings)
_NOPRES = PresolveSettings(twominorvarbounds=False, diagzeroimplcuts=False)


def _prob_matrixview():
    # X = [[1, y0], [y0, 1]] PSD  =>  |y0| <= 1; y0's declared box is
    # wider, so node propagation must tighten it
    blk = SDPBlock(size=2, var=[0], row=[1], col=[0], val=[1.0],
                   const_row=[0, 1], const_col=[0, 1],
                   const_val=[-1.0, -1.0])
    return MISDP(nvars=2, obj=np.array([1.0, 0.0]),
                 lb=np.array([-5.0, 0.0]), ub=np.array([5.0, 1.0]),
                 integral=np.array([False, True]), blocks=[blk],
                 lp=LinearConstraints.empty(), name="mv")


def test_propagate_node_applies_matrix_view_tightening():
    prob = _prob_matrixview()
    sol = _Solver(prob, Settings(bb=BBSettings(prop_freq=1),
                                 presolve=_NOPRES))
    lb, ub, conflict = sol.propagate_node(prob.lb.copy(), prob.ub.copy(),
                                          depth=1)
    assert not conflict
    assert ub[0] <= 1.0 + 1e-6 and lb[0] >= -1.0 - 1e-6
    assert sol.stats.redcost_tightenings >= 1


def test_propagate_node_respects_freq_off():
    prob = _prob_matrixview()
    sol = _Solver(prob, Settings(bb=BBSettings(prop_freq=0),
                                 presolve=_NOPRES))
    lb, ub, conflict = sol.propagate_node(prob.lb.copy(), prob.ub.copy(),
                                          depth=1)
    assert ub[0] == 5.0   # structural propagation disabled


def test_learn_nogood_row_semantics():
    prob = MISDP(nvars=3, obj=np.zeros(3), lb=np.zeros(3), ub=np.ones(3),
                 integral=np.ones(3, bool), blocks=[],
                 lp=LinearConstraints.empty(), name="ng")
    sol = _Solver(prob, Settings())
    root_lb, root_ub = prob.lb, prob.ub
    clb = np.array([1.0, 0.0, 0.0])   # y0 fixed to 1
    cub = np.array([1.0, 0.0, 1.0])   # y1 fixed to 0, y2 free
    sol.learn_nogood(clb, cub, root_lb, root_ub)
    assert sol.stats.nnogoods == 1
    (g,), (lhs,) = sol._conf_D, sol._conf_lhs
    # NOT(y0=1 AND y1=0)  <=>  (1 - y0) + y1 >= 1  <=>  y1 - y0 >= 0
    np.testing.assert_allclose(g, [-1.0, 1.0, 0.0])
    assert lhs == 0.0
    # the forbidden point violates the row, every other 0/1 point obeys it
    assert g @ np.array([1.0, 0.0, 1.0]) < lhs
    for y in ([0, 0], [0, 1], [1, 1]):
        assert g @ np.array([y[0], y[1], 0.0]) >= lhs - 1e-12
    # duplicate learning is ignored
    sol.learn_nogood(clb, cub, root_lb, root_ub)
    assert sol.stats.nnogoods == 1


def test_nogood_declined_for_nonbinary_deviations():
    """Soundness guard: a child whose bounds moved beyond its binary
    fixings (general-integer split, propagation tightening) must NOT
    yield a no-good — the row would claim the binary fixings alone are
    infeasible (regression: example_indicator LP mode 659232.92)."""
    prob = MISDP(
        nvars=3, obj=np.zeros(3),
        lb=np.array([0.0, 0.0, 0.0]), ub=np.array([1.0, 1.0, 10.0]),
        integral=np.array([True, True, True]), blocks=[],
        lp=LinearConstraints.empty(), name="ng")
    sol = _Solver(prob, Settings())
    root_lb, root_ub = prob.lb.copy(), prob.ub.copy()
    # binary fixing y0 = 1 PLUS a general-integer split y2 <= 4
    clb = root_lb.copy()
    cub = root_ub.copy()
    clb[0] = 1.0
    cub[2] = 4.0
    sol.learn_nogood(clb, cub, root_lb, root_ub)
    assert sol.stats.nnogoods == 0
    # pure binary fixing: learned
    cub2 = root_ub.copy()
    cub2[1] = 0.0
    clb2 = root_lb.copy()
    clb2[0] = 1.0
    sol.learn_nogood(clb2, cub2, root_lb, root_ub)
    assert sol.stats.nnogoods == 1
