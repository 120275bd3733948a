"""Independent solution verification + feastol-tightened re-solve
(sdpsolchecker.c:58 role; INFEASFEASTOLCHANGE re-solve loop,
sdpisolver_dsdp.c:66,1549).

Every OPTIMAL instance returned by solve_batch must pass the independent
check (true eigenvalue/row/bound violations <= feastol) even when the
problem data is badly scaled — the IPM's scaled residual tolerances alone
would accept solutions violating by ~feastol * datascale.
"""

import dataclasses

import numpy as np
import pytest

from scipsdp_tpu.core.feascheck import check_points
from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.utils.config import Settings
from scipsdp_tpu.utils.status import SolverResultStatus


def _scaled_small(scale):
    prob = read_problem("/root/reference/instances/example_small.dat-s")
    blocks = [dataclasses.replace(b, val=b.val * scale,
                                  const_val=b.const_val * scale)
              for b in prob.blocks]
    return dataclasses.replace(prob, blocks=blocks,
                               name=f"small_x{scale:g}")


@pytest.mark.parametrize("scale", [1.0, 1e4])
def test_verified_solutions(scale):
    prob = _scaled_small(scale)
    dense = densify(prob)
    iface = SDPInterface(dense, Settings())
    m = dense.nvars
    lb = np.tile(prob.lb[:m], (2, 1))
    ub = np.tile(prob.ub[:m], (2, 1))
    res = iface.solve_batch(lb, ub)
    opt = res.status == int(SolverResultStatus.OPTIMAL)
    assert opt.any()
    ok, viol = check_points(iface.data, res.y, lb, ub,
                            feastol=iface.settings.ipm.feastol)
    assert bool(np.all(np.asarray(ok)[opt])), np.asarray(viol)


def test_feastol_vec_tightens():
    """The traced per-instance convergence feastol actually tightens the
    returned solution (the re-solve rung's mechanism)."""
    prob = read_problem("/root/reference/instances/example_small.dat-s")
    dense = densify(prob)
    iface = SDPInterface(dense, Settings())
    m = dense.nvars
    B = 2
    bmat = np.tile(np.concatenate([dense.obj, [0.0]]), (B, 1))
    lbx = np.concatenate([np.tile(prob.lb[:m], (B, 1)),
                          np.zeros((B, 1))], axis=1)
    ubx = np.concatenate([np.tile(prob.ub[:m], (B, 1)),
                          np.zeros((B, 1))], axis=1)
    loose = iface._run(bmat, lbx, ubx, feastol_vec=np.full(B, 1e-3))
    tight = iface._run(bmat, lbx, ubx, feastol_vec=np.full(B, 1e-7))
    assert int(tight.iters) >= int(loose.iters)
    assert float(np.max(np.asarray(tight.pinf))) <= 1e-7 + 1e-12
