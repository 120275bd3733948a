"""SDP-structural propagation tests (cons_sdp propagation analogs)."""

import numpy as np

from scipsdp_tpu.core.propagate import (
    matrix_view,
    propagate_3minors,
    propagate_upper_bounds,
    tighten_bounds_onevar,
)
from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP, SDPBlock


def test_propagate_upper_bounds():
    """X = [[y0, y2], [y2, y1]], y0 <= 2, y1 <= 8: |y2| <= 4; y0 >= 0."""
    blk = SDPBlock(size=2, var=[0, 1, 2], row=[0, 1, 1], col=[0, 1, 0],
                   val=[1.0, 1.0, 1.0], const_row=[], const_col=[],
                   const_val=[])
    prob = MISDP(nvars=3, obj=np.zeros(3),
                 lb=np.array([-INF, -INF, -INF]),
                 ub=np.array([2.0, 8.0, INF]),
                 integral=np.zeros(3, bool), blocks=[blk],
                 lp=LinearConstraints.empty(), name="pub")
    lb, ub = prob.lb.copy(), prob.ub.copy()
    n = propagate_upper_bounds(prob, lb, ub)
    assert n >= 3
    assert lb[0] >= 0.0 and lb[1] >= 0.0        # diagonal nonnegativity
    assert abs(ub[2] - 4.0) < 1e-9 and abs(lb[2] + 4.0) < 1e-9


def test_propagate_3minors():
    """diag == 1, X_st fixed 1 -> entries (s,u), (t,u) equal: bounds meet."""
    # X = [[1, 1, y0], [1, 1, y1], [y0, y1, 1]] with y0 in [0, .5],
    # y1 in [.2, 1] -> both must lie in [.2, .5]
    blk = SDPBlock(
        size=3, var=[0, 1], row=[2, 2], col=[0, 1], val=[1.0, 1.0],
        const_row=[0, 1, 2, 1], const_col=[0, 1, 2, 0],
        const_val=[-1.0, -1.0, -1.0, -1.0],
    )
    prob = MISDP(nvars=2, obj=np.zeros(2),
                 lb=np.array([0.0, 0.2]), ub=np.array([0.5, 1.0]),
                 integral=np.zeros(2, bool), blocks=[blk],
                 lp=LinearConstraints.empty(), name="p3m")
    lb, ub = prob.lb.copy(), prob.ub.copy()
    n = propagate_3minors(prob, lb, ub)
    assert n >= 2
    assert lb[0] >= 0.2 - 1e-9 and ub[1] <= 0.5 + 1e-9


def test_tighten_bounds_onevar():
    """Z = y0*I + y1*E11 - diag(1, 4) with ub = (10, 0): y0 alone must
    satisfy y0*I >= diag(1,4) -> y0 >= 4."""
    blk = SDPBlock(size=2, var=[0, 0, 1], row=[0, 1, 0], col=[0, 1, 0],
                   val=[1.0, 1.0, 1.0],
                   const_row=[0, 1], const_col=[0, 1], const_val=[1.0, 4.0])
    prob = MISDP(nvars=2, obj=np.zeros(2),
                 lb=np.array([-INF, 0.0]), ub=np.array([10.0, 0.0]),
                 integral=np.zeros(2, bool), blocks=[blk],
                 lp=LinearConstraints.empty(), name="tb1")
    lb, ub = prob.lb.copy(), prob.ub.copy()
    n = tighten_bounds_onevar(prob, lb, ub)
    assert n >= 1
    assert lb[0] >= 4.0 - 1e-4


def test_trace_bound_detection():
    """Trace-bound detection (cons_sdp.c:4903-4950): X = diag-vars y0, y1
    with off-diagonal y2, plus a row y0 + y1 <= 3.  Without the trace row
    |y2| <= sqrt(8*8) = 8; the trace bound tightens it to 3/2."""
    from scipsdp_tpu.core.propagate import trace_bounds
    from scipsdp_tpu.models.problem import LinearConstraints

    blk = SDPBlock(size=2, var=[0, 1, 2], row=[0, 1, 1], col=[0, 1, 0],
                   val=[1.0, 1.0, 1.0], const_row=[], const_col=[],
                   const_val=[])
    lp = LinearConstraints.from_rows([([0, 1], [1.0, 1.0], -INF, 3.0)])
    prob = MISDP(nvars=3, obj=np.zeros(3),
                 lb=np.array([-INF, -INF, -INF]),
                 ub=np.array([8.0, 8.0, INF]),
                 integral=np.zeros(3, bool), blocks=[blk],
                 lp=lp, name="tb")
    tbs = trace_bounds(prob)
    assert tbs == {0: 3.0}
    lb, ub = prob.lb.copy(), prob.ub.copy()
    propagate_upper_bounds(prob, lb, ub)
    assert abs(ub[2] - 1.5) < 1e-9 and abs(lb[2] + 1.5) < 1e-9


def test_trace_bound_not_detected():
    """A row with a non-unit coefficient or missing a diagonal variable is
    NOT a trace bound (the strict-match conditions)."""
    from scipsdp_tpu.core.propagate import trace_bounds
    from scipsdp_tpu.models.problem import LinearConstraints

    blk = SDPBlock(size=2, var=[0, 1, 2], row=[0, 1, 1], col=[0, 1, 0],
                   val=[1.0, 1.0, 1.0], const_row=[], const_col=[],
                   const_val=[])
    for rows in ([([0, 1], [1.0, 2.0], -INF, 3.0)],      # coef != 1
                 [([0, 2], [1.0, 1.0], -INF, 3.0)],      # wrong var set
                 [([0], [1.0], -INF, 3.0)],              # too few vars
                 [([0, 1], [1.0, 1.0], 1.0, INF)]):      # no finite rhs
        lp = LinearConstraints.from_rows(rows)
        prob = MISDP(nvars=3, obj=np.zeros(3),
                     lb=np.array([-INF, -INF, -INF]),
                     ub=np.array([8.0, 8.0, INF]),
                     integral=np.zeros(3, bool), blocks=[blk],
                     lp=lp, name="tbn")
        assert trace_bounds(prob) == {}


def test_trace_bound_without_diag_ubs():
    """The trace bound applies even when the diagonal upper bounds are
    infinite (the sqrt-product bound alone is useless there)."""
    from scipsdp_tpu.models.problem import LinearConstraints

    blk = SDPBlock(size=2, var=[0, 1, 2], row=[0, 1, 1], col=[0, 1, 0],
                   val=[1.0, 1.0, 1.0], const_row=[], const_col=[],
                   const_val=[])
    lp = LinearConstraints.from_rows([([0, 1], [1.0, 1.0], -INF, 5.0)])
    prob = MISDP(nvars=3, obj=np.zeros(3),
                 lb=np.array([-INF, -INF, -INF]),
                 ub=np.array([INF, INF, INF]),
                 integral=np.zeros(3, bool), blocks=[blk],
                 lp=lp, name="tbinf")
    lb, ub = prob.lb.copy(), prob.ub.copy()
    propagate_upper_bounds(prob, lb, ub)
    assert abs(ub[2] - 2.5) < 1e-9 and abs(lb[2] + 2.5) < 1e-9
