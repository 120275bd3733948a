"""LP outer-approximation mode tests (misc/solvesdps = 0)."""

import os

import pytest

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.utils.config import Settings
from scipsdp_tpu.utils.status import SolveStatus

from conftest import INSTANCES

CASES = [
    ("example_small.dat-s", -8.0),
    ("example_inf.dat-s", "infeasible"),
    ("example_tightenmatrices.dat-s", -9.0),
]


@pytest.mark.parametrize("name,expect", CASES, ids=[c[0] for c in CASES])
def test_lp_mode_parity(name, expect):
    prob = read_problem(os.path.join(INSTANCES, name))
    res = solve_misdp(prob, Settings(solve_sdps=0))
    if expect == "infeasible":
        assert res.status == SolveStatus.INFEASIBLE
    else:
        assert res.status == SolveStatus.OPTIMAL
        assert abs(res.objval - expect) <= 1e-4 * max(1.0, abs(expect))
    if expect != "infeasible":
        # LP mode must actually have separated eigenvector cuts (the SDP
        # blocks are only enforced through them); the infeasible case may
        # be decided by bound propagation before any separation round
        assert res.stats.ncuts > 0


def test_lpmode_exact_enforcement_path():
    """enforcesdp (cons_sdp.c:8276-8423): with enforce_after=0 an
    SDP-infeasible INTEGRAL LP point triggers the exact probing solve
    instead of endless separation; parity must hold and the counter must
    fire.  Uses a constructed instance whose pure-LP optimum is integral
    but SDP-infeasible: maximize y0+y1 over binaries subject to the
    correlation matrix [[1,y0,0],[y0,1,y1],[0,y1,1]] >= 0 (i.e.
    y0^2 + y1^2 <= 1), so the LP relaxation's (1,1) violates the SDP and
    the true optimum is -1 (one of the two)."""
    import numpy as np

    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models.problem import LinearConstraints, MISDP, SDPBlock
    from scipsdp_tpu.utils.config import BBSettings, Settings

    blk = SDPBlock(size=3,
                   var=[0, 1], row=[1, 2], col=[0, 1], val=[1.0, 1.0],
                   const_row=[0, 1, 2], const_col=[0, 1, 2],
                   const_val=[-1.0, -1.0, -1.0])
    prob = MISDP(nvars=2, obj=np.array([-1.0, -1.0]),
                 lb=np.zeros(2), ub=np.ones(2),
                 integral=np.ones(2, dtype=bool), blocks=[blk],
                 lp=LinearConstraints.empty(), name="corr_enforce")
    s = Settings(solve_sdps=0,
                 bb=BBSettings(enforcesdp=True, enforce_after=0))
    res = solve_misdp(prob, s)
    assert res.status.name == "OPTIMAL"
    assert res.objval == pytest.approx(-1.0, abs=1e-4)
    assert res.stats.nenforce_sdp > 0
