"""Symmetry detection/breaking tests (compute_symmetry_bliss analog)."""

import numpy as np

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.core.symmetry import find_orbits, symmetry_breaking_rows
from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP, SDPBlock
from scipsdp_tpu.utils.config import Settings


def _symmetric_prob():
    """min -(y1+y2+y3) s.t. y1+y2+y3 <= 2, diag(y) <= I (via block),
    y binary — fully interchangeable variables."""
    blk = SDPBlock(
        size=3, var=[0, 1, 2], row=[0, 1, 2], col=[0, 1, 2],
        val=[-1.0, -1.0, -1.0],
        const_row=[0, 1, 2], const_col=[0, 1, 2], const_val=[-1.0, -1.0, -1.0],
    )
    return MISDP(
        nvars=3, obj=np.array([-1.0, -1.0, -1.0]),
        lb=np.zeros(3), ub=np.ones(3), integral=np.ones(3, bool),
        blocks=[blk],
        lp=LinearConstraints.from_rows([([0, 1, 2], [1, 1, 1], -INF, 2.0)]),
        name="sym3",
    )


def test_find_orbits_symmetric():
    prob = _symmetric_prob()
    orbits = find_orbits(prob)
    assert len(orbits) == 1
    assert sorted(orbits[0]) == [0, 1, 2]


def test_symmetry_breaking_preserves_optimum():
    prob = _symmetric_prob()
    rows = symmetry_breaking_rows(prob)
    assert len(rows) == 2   # y0 >= y1 >= y2
    res0 = solve_misdp(prob)
    res1 = solve_misdp(prob, Settings(use_symmetry=True))
    assert abs(res0.objval - (-2.0)) < 1e-4
    assert abs(res1.objval - (-2.0)) < 1e-4


def test_no_false_orbits_on_asymmetric():
    prob = _symmetric_prob()
    prob.obj[0] = -2.0   # break the symmetry
    orbits = find_orbits(prob)
    assert all(0 not in o for o in orbits)
