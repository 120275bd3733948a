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


def test_diag_zero_impl_rows():
    from scipsdp_tpu.core.presolve_sdp import diag_zero_impl_rows
    # X = [[A(y)_00, 1], [1, 2]] with (A_0)_00 = 0, entry (1,0) constant
    # -1 (so X_10 = 1), diagonal (0,0) covered only by integer y0, y1:
    # PSD needs X_00 > 0  =>  y0 + y1 >= 1
    blk = SDPBlock(size=2, var=[0, 1], row=[0, 0], col=[0, 0],
                   val=[1.0, 1.0],
                   const_row=[1, 1], const_col=[0, 1],
                   const_val=[-1.0, -2.0])
    prob = MISDP(nvars=2, obj=np.zeros(2), lb=np.zeros(2),
                 ub=np.ones(2), integral=np.ones(2, bool),
                 blocks=[blk], lp=LinearConstraints.empty(), name="dzi")
    rows = diag_zero_impl_rows(prob)
    assert len(rows) == 1
    inds, vals, lo, hi = rows[0]
    assert sorted(inds) == [0, 1] and vals == [1.0, 1.0] and lo == 1.0
    # negative lower bound on an integer variable disables the cut
    prob2 = MISDP(nvars=2, obj=np.zeros(2), lb=np.array([-1.0, 0.0]),
                  ub=np.ones(2), integral=np.ones(2, bool),
                  blocks=[blk], lp=LinearConstraints.empty(), name="dzi2")
    assert diag_zero_impl_rows(prob2) == []
    # a continuous variable covering the diagonal disables the cut
    prob3 = MISDP(nvars=2, obj=np.zeros(2), lb=np.zeros(2),
                  ub=np.ones(2), integral=np.array([True, False]),
                  blocks=[blk], lp=LinearConstraints.empty(), name="dzi3")
    assert diag_zero_impl_rows(prob3) == []


def test_two_minor_prod_rows():
    from scipsdp_tpu.core.presolve_sdp import two_minor_prod_rows
    # constant diagonals (A_0)_00 = -4, (A_0)_11 = -1 (X_ss = 4, X_tt = 1),
    # variable off-diagonal: X_10 = 3 y0 - (A_0)_10 with (A_0)_10 = 0.5
    # => 3 y0 >= 0.5 - sqrt(4) = -1.5
    blk = SDPBlock(size=2, var=[0], row=[1], col=[0], val=[3.0],
                   const_row=[0, 1, 1], const_col=[0, 1, 0],
                   const_val=[-4.0, -1.0, 0.5])
    prob = MISDP(nvars=1, obj=np.zeros(1), lb=np.full(1, -INF),
                 ub=np.full(1, INF), integral=np.zeros(1, bool),
                 blocks=[blk], lp=LinearConstraints.empty(), name="tmp")
    rows = two_minor_prod_rows(prob)
    assert len(rows) == 1
    inds, vals, lo, hi = rows[0]
    assert inds == [0] and vals == [3.0]
    assert abs(lo - (0.5 - 2.0)) < 1e-12
    # PSD-wise: X = [[4, 3y-0.5], [3y-0.5, 1]] >= 0 iff |3y-0.5| <= 2,
    # so the generated one-sided row 3y >= -1.5 is valid and tight


def test_two_minor_varbound_rows_validity():
    from scipsdp_tpu.core.presolve_sdp import two_minor_varbound_rows
    rng = np.random.default_rng(5)
    # random 2x2 affine block with box [0,1]^2; check every generated row
    # is satisfied by all PSD-feasible corner/grid points
    blk = SDPBlock(size=2, var=[0, 0, 1, 1], row=[0, 1, 1, 1],
                   col=[0, 0, 1, 0], val=[2.0, 1.0, 1.5, -0.5],
                   const_row=[0, 1], const_col=[0, 1],
                   const_val=[-1.0, -0.5])
    prob = MISDP(nvars=2, obj=np.zeros(2), lb=np.zeros(2), ub=np.ones(2),
                 integral=np.zeros(2, bool), blocks=[blk],
                 lp=LinearConstraints.empty(), name="tmvb")
    rows = two_minor_varbound_rows(prob)
    assert rows, "expected some varbound rows"
    A = blk.dense_coeff(2)
    C = blk.dense_const()
    for y0 in np.linspace(0, 1, 7):
        for y1 in np.linspace(0, 1, 7):
            y = np.array([y0, y1])
            Z = np.einsum("j,jab->ab", y, A) - C
            if np.linalg.eigvalsh(Z)[0] >= -1e-9:   # PSD-feasible point
                for inds, vals, lo, hi in rows:
                    act = sum(v * y[i] for i, v in zip(inds, vals))
                    assert act >= lo - 1e-7 and act <= hi + 1e-7


def test_tighten_matrices():
    from scipsdp_tpu.core.presolve_sdp import tighten_matrices
    # block: y0 * (4 I) - I >= 0 with binary y0: y0 = 1 gives 4I - I >= 0;
    # minimal feasible y is 0.25, so A_0 can be tightened to 0.25 * 4I = I
    blk = SDPBlock(size=2, var=[0, 0], row=[0, 1], col=[0, 1],
                   val=[4.0, 4.0],
                   const_row=[0, 1], const_col=[0, 1], const_val=[1.0, 1.0])
    prob = MISDP(nvars=1, obj=np.array([1.0]), lb=np.zeros(1),
                 ub=np.ones(1), integral=np.ones(1, bool),
                 blocks=[blk], lp=LinearConstraints.empty(), name="tm")
    out = tighten_matrices(prob)
    np.testing.assert_allclose(out.blocks[0].val, [1.0, 1.0], atol=1e-3)
    # the binary feasible set is unchanged: y0=1 stays feasible, y0=0 not
    A = out.blocks[0].dense_coeff(1)[0]
    C = out.blocks[0].dense_const()
    assert np.linalg.eigvalsh(1.0 * A - C)[0] >= -1e-6
    assert np.linalg.eigvalsh(0.0 * A - C)[0] < -1e-6


def test_proprows_routed_by_mode():
    from scipsdp_tpu.core.presolve_sdp import presolve_problem as pp
    blk = SDPBlock(size=2, var=[0, 1], row=[0, 0], col=[0, 0],
                   val=[1.0, 1.0],
                   const_row=[1, 1], const_col=[0, 1],
                   const_val=[-1.0, -2.0])
    prob = MISDP(nvars=2, obj=np.zeros(2), lb=np.zeros(2),
                 ub=np.ones(2), integral=np.ones(2, bool),
                 blocks=[blk], lp=LinearConstraints.empty(), name="route")
    out_sdp = pp(prob, Settings())
    assert out_sdp.proprows is not None and out_sdp.proprows.nrows >= 1
    assert out_sdp.lp.nrows == 0
    out_lp = pp(prob, Settings(solve_sdps=0))
    assert out_lp.proprows is None or out_lp.proprows.nrows == 0
    assert out_lp.lp.nrows >= 1
    # proprows participate in bound propagation: y0 + y1 >= 1 with
    # ub = (1, 0) forces y0 >= 1
    lb, ub, c = tighten_bounds(out_sdp, np.zeros(2), np.array([1.0, 0.0]))
    assert not c and lb[0] >= 1.0 - 1e-9


def test_fix_and_aggregate():
    from scipsdp_tpu.core.presolve_sdp import (fix_and_aggregate,
                                               postsolve_solution)
    # y0 fixed at 2; y1 + y2 == 3 aggregates continuous y1 = 3 - y2
    blk = SDPBlock(size=2, var=[0, 1, 2], row=[0, 1, 1], col=[0, 1, 1],
                   val=[1.0, 1.0, 2.0],
                   const_row=[0, 1], const_col=[0, 1],
                   const_val=[1.0, 2.0])
    lp = LinearConstraints.from_rows([([1, 2], [1.0, 1.0], 3.0, 3.0)])
    prob = MISDP(nvars=3, obj=np.array([1.0, 1.0, 2.0]),
                 lb=np.array([2.0, 0.0, 0.0]),
                 ub=np.array([2.0, 10.0, 10.0]),
                 integral=np.array([False, False, True]),
                 blocks=[blk], lp=lp, name="agg")
    red = fix_and_aggregate(prob, aggregate=True)
    assert red.nvars == 1            # only y2 remains
    assert red.postsolve is not None
    # block entry (1,1): y1 + 2 y2 - 2 >= 0 -> (3 - y2) + 2 y2 - 2
    #                  = y2 + 1 >= 0;   (0,0): y0 - 1 = 1 (constant, PSD ok)
    A = red.blocks[0].dense_coeff(1)
    C = red.blocks[0].dense_const()
    assert abs(A[0, 1, 1] - 1.0) < 1e-12
    assert abs(C[1, 1] - (-1.0)) < 1e-12    # -(3 - 2) + 2 = ... folded
    assert abs(C[0, 0] - (-1.0)) < 1e-12    # 1 - y0*1 = 1 - 2 = -1
    # objective: 1*y0 + 1*y1 + 2*y2 = 2 + (3 - y2) + 2 y2 = 5 + y2
    assert abs(red.obj[0] - 1.0) < 1e-12
    assert abs(red.objoffset - 5.0) < 1e-12
    # bounds of y1 transferred: 3 - y2 in [0, 10] -> y2 in [-7, 3] & [0,10]
    assert red.lb[0] >= -7.0 - 1e-9 and red.ub[0] <= 3.0 + 1e-9
    # postsolve reconstructs the full point
    y = postsolve_solution(red, np.array([1.5]))
    np.testing.assert_allclose(y, [2.0, 1.5, 1.5])


def test_fix_and_aggregate_solve_parity():
    from scipsdp_tpu.core.branchbound import solve_misdp
    # same problem solved with and without aggregation must agree
    blk = SDPBlock(size=2, var=[1, 2], row=[0, 1], col=[0, 1],
                   val=[1.0, 1.0],
                   const_row=[0, 1], const_col=[0, 1],
                   const_val=[1.0, 1.0])
    lp = LinearConstraints.from_rows([([1, 2], [1.0, 1.0], 4.0, 4.0)])
    prob = MISDP(nvars=3, obj=np.array([0.0, 1.0, 2.0]),
                 lb=np.array([1.0, 0.0, 0.0]),
                 ub=np.array([1.0, 10.0, 10.0]),
                 integral=np.array([False, False, True]),
                 blocks=[blk], lp=lp, name="aggsolve")
    r1 = solve_misdp(prob, Settings(
        presolve=PresolveSettings(fixvars=False, aggregate=False)))
    r2 = solve_misdp(prob, Settings(
        presolve=PresolveSettings(fixvars=True, aggregate=True)))
    assert abs(r1.objval - r2.objval) < 1e-5
    assert r2.best_y.shape == (3,)
    # reconstructed solution satisfies the equality row
    assert abs(r2.best_y[1] + r2.best_y[2] - 4.0) < 1e-5


def test_two_minor_soc_quadcons_preserve_optimum():
    """twominorsocconss (cons_sdp.c:2786-2807): the rotated-SOC 2-minor
    relations are implied by PSD, so adding them must keep the optimum."""
    import os

    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.core.presolve_sdp import two_minor_soc_quadcons
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.utils.config import BBSettings, PresolveSettings, Settings

    prob = read_problem("/root/reference/instances/example_small.dat-s")
    qcs = two_minor_soc_quadcons(prob)
    assert qcs, "example_small has variable off-diagonal 2-minors"
    # the quadratic encodes X_st^2 - X_ss X_tt <= 0: at a PSD-feasible
    # point it must hold
    res0 = solve_misdp(prob)
    s = Settings(presolve=PresolveSettings(twominorsocconss=True),
                 bb=BBSettings(batch_size=4))
    res1 = solve_misdp(prob, s)
    assert abs(res0.objval - res1.objval) < 1e-3


def test_general_multiaggregation():
    """multiaggrVar (cons_sdp.c:4317-4498): equality rows with >= 3
    variables eliminate a continuous variable; bounds survive as a ranged
    row; postsolve reconstructs the original-space solution."""
    import numpy as np

    from scipsdp_tpu.core.presolve_sdp import (fix_and_aggregate,
                                               postsolve_solution)
    from scipsdp_tpu.models.io import read_problem

    prob = read_problem("/root/reference/instances/example_multaggr2.cbf")
    red = fix_and_aggregate(prob, aggregate=True)
    assert red.nvars < prob.nvars - 40   # multi-rows actually eliminated
    # every multi-aggregation op must reference >= 2 terms or be a fixing
    m_orig, keep, ops = red.postsolve
    assert any(len(terms) >= 2 for (_, terms, _) in ops)
    # postsolve reconstructs a consistent original-space point: all
    # eliminated equality rows hold at the lifted solution
    y_red = 0.5 * (np.where(red.lb > -1e19, red.lb, 0.0)
                   + np.where(red.ub < 1e19, red.ub, 1.0))
    y = postsolve_solution(red, y_red)
    D = prob.lp.dense(prob.nvars)
    act = D @ y
    eq = (np.abs(prob.lp.lhs - prob.lp.rhs) < 1e-9)
    # rows fully determined by eliminations: activity == rhs
    viol = np.abs(act - prob.lp.rhs)[eq]
    # at least the eliminated rows must close exactly (tolerate the rest)
    assert np.sort(viol)[: red.postsolve and 40].max() < 1e-6
