"""Tests for the one-variable solver (check1dsdp.c analog) and the
probing-based heuristics/propagators/diagnostics."""

import numpy as np
import pytest

from scipsdp_tpu.core.probing import (
    analytic_center,
    fracdive,
    obbt_root,
    slater_check,
)
from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import INF, densify
from scipsdp_tpu.ops.onevar import solve_one_var_sdp

from conftest import INSTANCES
import os


def test_onevar_interval():
    """y*I - diag(1,4) >= 0  <=>  y >= 4; min y -> 4."""
    A = np.eye(2)
    C = np.diag([1.0, 4.0])
    st, y = solve_one_var_sdp(A, C, c=1.0, lb=-INF, ub=INF)
    assert st == "optimal" and abs(y - 4.0) < 1e-5


def test_onevar_maximize_side():
    """min -y s.t. y*diag(1,-1) - (-I) >= 0: y in [-1, 1] -> y* = 1."""
    A = np.diag([1.0, -1.0])
    C = -np.eye(2)
    st, y = solve_one_var_sdp(A, C, c=-1.0, lb=-INF, ub=INF)
    assert st == "optimal" and abs(y - 1.0) < 1e-5


def test_onevar_infeasible():
    """y * 0 - I >= 0 impossible."""
    A = np.zeros((2, 2))
    C = np.eye(2)
    st, _ = solve_one_var_sdp(A, C, c=1.0, lb=-10, ub=10)
    assert st == "infeasible"


def test_onevar_bounds_active():
    A = np.eye(2)
    C = np.diag([1.0, 4.0])
    st, y = solve_one_var_sdp(A, C, c=1.0, lb=6.0, ub=10.0)
    assert st == "optimal" and abs(y - 6.0) < 1e-6


@pytest.fixture(scope="module")
def small_iface():
    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    return prob, SDPInterface(densify(prob))


def test_slater_check(small_iface):
    prob, iface = small_iface
    st = slater_check(iface, prob.lb[None, :], prob.ub[None, :])
    assert st[0] == 1   # example_small has a strict interior


def test_analytic_center(small_iface):
    prob, iface = small_iface
    y, ok = analytic_center(iface, prob.lb[None, :], prob.ub[None, :])
    assert ok[0]
    # the center must be strictly feasible
    from scipsdp_tpu.core.feascheck import check_points
    import jax.numpy as jnp
    feas, viol = check_points(iface.data, jnp.asarray(y),
                              jnp.asarray(prob.lb[None, :]),
                              jnp.asarray(prob.ub[None, :]))
    assert bool(np.asarray(feas)[0])


def test_obbt_root(small_iface):
    prob, iface = small_iface
    lb, ub, n = obbt_root(iface, prob.lb.copy(), prob.ub.copy(),
                          np.arange(3), cutoff=None, batch_size=8,
                          feastol=1e-5)
    assert n > 0
    assert np.all(lb >= prob.lb - 1e-9) and np.all(ub <= prob.ub + 1e-9)
    # OBBT bounds must not cut off the known optimum y = (0, 1, 7)... the
    # MISDP optimum is -8 attained at an integer point inside the box
    from scipsdp_tpu.core.branchbound import solve_misdp
    import dataclasses
    prob2 = dataclasses.replace(prob, lb=lb, ub=ub)
    res = solve_misdp(prob2)
    assert abs(res.objval - (-8.0)) < 1e-4


def test_fracdive(small_iface):
    prob, iface = small_iface
    res = iface.solve_batch(prob.lb[None, :], prob.ub[None, :])
    ydive, feas = fracdive(iface, prob.lb[None, :], prob.ub[None, :],
                           res.y, prob.integral, 1e-5)
    if feas[0]:
        assert np.abs(ydive[0][prob.integral]
                      - np.round(ydive[0][prob.integral])).max() <= 1e-5


def test_inner_lp_point():
    """dd-certifiable problem: Z = y1*I + y2*E12, y1 in [0,4], y2 in [0,1];
    the optimum (4, 1) is diagonally dominant, so the inner LP finds it."""
    from scipsdp_tpu.core.probing import inner_lp_point
    from scipsdp_tpu.models.problem import LinearConstraints, MISDP, SDPBlock
    from scipsdp_tpu.utils.config import Settings

    blk = SDPBlock(size=2, var=[0, 0, 1], row=[0, 1, 1], col=[0, 1, 0],
                   val=[1.0, 1.0, 1.0], const_row=[], const_col=[],
                   const_val=[])
    prob = MISDP(nvars=2, obj=np.array([-1.0, -1.0]),
                 lb=np.zeros(2), ub=np.array([4.0, 1.0]),
                 integral=np.zeros(2, bool), blocks=[blk],
                 lp=LinearConstraints.empty(), name="ddtest")
    y, ok = inner_lp_point(prob, Settings())
    assert ok
    np.testing.assert_allclose(y, [4.0, 1.0], atol=1e-3)
    # and the point is genuinely SDP-feasible
    from scipsdp_tpu.core.feascheck import check_points
    from scipsdp_tpu.core.sdpi import SDPInterface
    from scipsdp_tpu.models.problem import densify
    import jax.numpy as jnp
    iface = SDPInterface(densify(prob))
    f, _ = check_points(iface.data, y[None, :],
                        jnp.asarray(prob.lb[None, :]),
                        jnp.asarray(prob.ub[None, :]))
    assert bool(np.asarray(f)[0])


def test_warmstart_diving_interaction_regression():
    """warmstart+diving once accepted an infeasible incumbent (-9 < true
    optimum -8 on example_small): dives must verify their points."""
    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.utils.config import BBSettings, Settings

    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    res = solve_misdp(prob, Settings(bb=BBSettings(warmstart=True,
                                                   diving_freq=2)))
    assert abs(res.objval - (-8.0)) < 1e-4


def test_rounding_problem_warmstart_and_cutoff():
    """solvePrimalRoundingProblem analog (warmstartproject = 4)."""
    from scipsdp_tpu.core.probing import rounding_problem
    from scipsdp_tpu.core.sdpi import SDPInterface
    from scipsdp_tpu.models.problem import (LinearConstraints, MISDP,
                                            SDPBlock, densify)
    from scipsdp_tpu.utils.config import Settings
    from scipsdp_tpu.utils.status import SolverResultStatus

    blk = SDPBlock(size=2, var=[0, 0], row=[0, 1], col=[0, 1],
                   val=[1.0, 1.0],
                   const_row=[0, 1], const_col=[0, 1], const_val=[1.0, 1.0])
    prob = MISDP(nvars=1, obj=np.array([1.0]), lb=np.zeros(1),
                 ub=np.full(1, 3.0), integral=np.zeros(1, bool),
                 blocks=[blk], lp=LinearConstraints.empty(), name="rp")
    dense = densify(prob)
    s = Settings()
    iface = SDPInterface(dense, s)
    res = iface.solve_batch(prob.lb[None], prob.ub[None])
    assert res.status[0] == int(SolverResultStatus.OPTIMAL)
    parent_X = [np.asarray(res.X[t][0, slot])
                for (t, slot) in iface.data.block_of]
    # warmstart path: optimal value 1.0 < cutoff -> "ok" with y ~ 1
    action, wy = rounding_problem(prob, dense, s, parent_X, res.y[0],
                                  prob.lb, prob.ub, cutoff=10.0)
    assert action == "ok"
    assert abs(wy[0] - 1.0) < 1e-3
    # cutoff path: restricted primal optimum 1.0 >= cutoff 0.5
    action2, _ = rounding_problem(prob, dense, s, parent_X, res.y[0],
                                  prob.lb, prob.ub, cutoff=0.5)
    assert action2 == "cutoff"


def test_bb_warmstartproject4_end_to_end():
    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.utils.config import BBSettings, Settings

    prob = read_problem("/root/reference/instances/example_small.dat-s")
    s = Settings(bb=BBSettings(batch_size=4, warmstart=True,
                               warmstartproject=4))
    res = solve_misdp(prob, s)
    assert abs(res.objval - (-8.0)) < 1e-4


def test_slater_check_primal():
    """Primal Slater check (sdpi.c:1483-1515 reformulated dual)."""
    from scipsdp_tpu.core.probing import slater_check_primal
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.models.problem import (INF, LinearConstraints, MISDP,
                                            SDPBlock)
    from scipsdp_tpu.utils.config import Settings

    prob = read_problem("/root/reference/instances/example_small.dat-s")
    assert slater_check_primal(prob, Settings(), prob.lb, prob.ub) == 1

    # failing case: feasible primal X must have X_00 = 0 (singular), so no
    # strictly positive definite primal point exists
    blk = SDPBlock(size=2, var=[0], row=[0], col=[0], val=[1.0],
                   const_row=[], const_col=[], const_val=[])
    bad = MISDP(nvars=1, obj=np.zeros(1), lb=np.full(1, -INF),
                ub=np.full(1, INF), integral=np.zeros(1, bool),
                blocks=[blk], lp=LinearConstraints.empty(), name="nps")
    assert slater_check_primal(bad, Settings(), bad.lb, bad.ub) == 0


def test_innerlp_heuristic_in_bb():
    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.utils.config import BBSettings, Settings

    prob = read_problem("/root/reference/instances/example_small.dat-s")
    res = solve_misdp(prob, Settings(bb=BBSettings(
        batch_size=4, heuristic_innerlp=True)))
    assert abs(res.objval - (-8.0)) < 1e-4
