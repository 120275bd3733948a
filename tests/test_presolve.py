"""Presolve transformation tests (cons_sdp presolve analogs)."""

import numpy as np

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.core.presolve_sdp import (
    diag_ge_zero_rows,
    move_1x1_blocks,
    presolve_problem,
    two_minor_lin_rows,
)
from scipsdp_tpu.core.propagate import tighten_bounds
from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP, SDPBlock
from scipsdp_tpu.utils.config import PresolveSettings, Settings


def _prob_with_1x1():
    """min -y1 s.t. [y1-?]: 1x1 block  2 y1 - 3 >= 0 -> y1 >= 1.5, y1<=5."""
    blk1 = SDPBlock(size=1, var=[0], row=[0], col=[0], val=[2.0],
                    const_row=[0], const_col=[0], const_val=[3.0])
    blk2 = SDPBlock(size=2, var=[0, 1], row=[0, 1], col=[0, 1],
                    val=[1.0, 1.0], const_row=[], const_col=[],
                    const_val=[])
    return MISDP(
        nvars=2, obj=np.array([-1.0, 0.0]),
        lb=np.array([-INF, 0.0]), ub=np.array([5.0, 1.0]),
        integral=np.zeros(2, bool), blocks=[blk1, blk2],
        lp=LinearConstraints.empty(), name="p1x1",
    )


def test_move_1x1_blocks():
    prob = _prob_with_1x1()
    out = move_1x1_blocks(prob)
    assert len(out.blocks) == 1
    assert out.lp.nrows == 1
    # row: 2 y1 >= 3
    lb, ub, c = tighten_bounds(out, out.lb.copy(), out.ub.copy())
    assert not c
    assert abs(lb[0] - 1.5) < 1e-9


def test_1x1_solve_parity():
    prob = _prob_with_1x1()
    res = solve_misdp(prob)   # presolve moves the block automatically
    assert abs(res.objval - (-5.0)) < 1e-4


def test_diag_ge_zero_rows():
    blk = SDPBlock(size=2, var=[0, 1, 0], row=[0, 1, 1], col=[0, 1, 0],
                   val=[1.0, 2.0, 1.0], const_row=[0], const_col=[0],
                   const_val=[0.5])
    prob = MISDP(nvars=2, obj=np.zeros(2), lb=np.full(2, -INF),
                 ub=np.full(2, INF), integral=np.zeros(2, bool),
                 blocks=[blk], lp=LinearConstraints.empty(), name="dg")
    rows = diag_ge_zero_rows(prob)
    assert len(rows) == 2
    inds, vals, lo, hi = rows[0]   # diag (0,0): 1*y0 >= 0.5
    assert inds == [0] and vals == [1.0] and lo == 0.5
    minor = two_minor_lin_rows(prob)
    # v = e1 - e0: A(y)_00 + A(y)_11 - 2 A(y)_01 >= C_00 + C_11 - 2 C_01
    assert len(minor) == 1
    inds, vals, lo, hi = minor[0]
    np.testing.assert_allclose(sorted(vals), [-1.0, 2.0])


def test_presolve_settings_respected():
    prob = _prob_with_1x1()
    s = Settings(presolve=PresolveSettings(move_1x1_blocks=False))
    out = presolve_problem(prob, s)
    assert len(out.blocks) == 2
    s2 = Settings(presolve=PresolveSettings(diaggezerocuts=True,
                                            twominorlinconss=True))
    out2 = presolve_problem(prob, s2)
    assert out2.lp.nrows > 1


def test_settings_file_loader():
    from scipsdp_tpu.utils.paramfile import load_settings_file
    s = load_settings_file("/root/reference/settings/lp_approx.set")
    assert s.solve_sdps == 0
    s2 = load_settings_file("/root/reference/settings/scip-1.set")
    assert s2.ipm.gaptol == 1e-5
