"""LP-mode host simplex path (scipy HiGHS) vs the IPM ladder."""
import numpy as np
import pytest

from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.problem import INF, LinearConstraints, MISDP, densify
from scipsdp_tpu.utils.config import BBSettings, Settings
from scipsdp_tpu.utils.status import SolverResultStatus


def _lp_problem():
    # min x0 + 2 x1  s.t. x0 + x1 >= 1, x0 - x1 >= -0.5, 0 <= x <= 2
    return MISDP(
        nvars=2, obj=np.array([1.0, 2.0]),
        lb=np.zeros(2), ub=np.full(2, 2.0),
        integral=np.zeros(2, bool), blocks=[],
        lp=LinearConstraints.from_rows([
            ([0, 1], [1.0, 1.0], 1.0, INF),
            ([0, 1], [1.0, -1.0], -0.5, INF),
        ]),
        name="lp2")


def test_lp_host_matches_ipm():
    prob = _lp_problem()
    d = densify(prob)
    lb = np.tile(prob.lb, (3, 1))
    ub = np.tile(prob.ub, (3, 1))
    ub[1, 0] = 0.25     # force the second row active for member 1
    lb[2, 0] = 1.5
    host = SDPInterface(d, Settings(), lp_host=True)
    ipm = SDPInterface(d, Settings(), lp_host=False)
    rh = host.solve_batch(lb, ub)
    ri = ipm.solve_batch(lb, ub)
    assert np.all(rh.status == int(SolverResultStatus.OPTIMAL))
    np.testing.assert_allclose(rh.objval, ri.objval, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(rh.y, ri.y, rtol=1e-5, atol=1e-5)


def test_lp_host_infeasible_and_cuts():
    d = densify(_lp_problem())
    host = SDPInterface(d, Settings(), lp_host=True)
    # conflicting cut x0 + x1 <= 0.2 as -x0 - x1 >= -0.2? cuts are >=-rows:
    Gc = np.array([[[-1.0, -1.0]]])
    hc = np.array([[0.5]])   # -x0 - x1 >= 0.5  <=>  x0 + x1 <= -0.5: infeasible
    val = np.array([[True]])
    r = host.solve_batch(np.zeros((1, 2)), np.full((1, 2), 2.0),
                         cuts=(Gc, hc, val))
    assert int(r.status[0]) == int(SolverResultStatus.INFEASIBLE)
    # non-binding cut keeps the optimum
    hc2 = np.array([[-10.0]])
    r2 = host.solve_batch(np.zeros((1, 2)), np.full((1, 2), 2.0),
                          cuts=(Gc, hc2, val))
    assert int(r2.status[0]) == int(SolverResultStatus.OPTIMAL)
    assert r2.objval[0] == pytest.approx(1.0, abs=1e-6)  # x=(1,0)
