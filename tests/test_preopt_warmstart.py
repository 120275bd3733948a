"""Pre-optimal-solution warmstarts (warmstartpreoptsol,
relax_sdp.c:77-86; SDPA preoptimal capture sdpisolver_sdpa.cpp:1612-1618)."""

import os

import numpy as np

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.utils.config import BBSettings, IPMSettings, Settings


def test_preopt_snapshot_captured(instances_dir):
    prob = read_problem(os.path.join(instances_dir, "example_small.dat-s"))
    s = Settings(ipm=IPMSettings(preopt_gap=1e-2))
    iface = SDPInterface(densify(prob), s)
    res = iface.solve_batch(prob.lb[None, :], prob.ub[None, :])
    assert res.pre_has is not None and bool(res.pre_has[0])
    # the snapshot is an earlier, different iterate than the optimum
    assert np.linalg.norm(res.pre_y[0] - res.y[0]) > 1e-8
    assert res.pre_X is not None and len(res.pre_X) > 0


def test_preopt_disabled_by_default(instances_dir):
    prob = read_problem(os.path.join(instances_dir, "example_small.dat-s"))
    iface = SDPInterface(densify(prob), Settings())
    res = iface.solve_batch(prob.lb[None, :], prob.ub[None, :])
    assert res.pre_has is None


def test_preopt_warmstart_solve_parity(instances_dir):
    prob = read_problem(os.path.join(instances_dir, "example_small.dat-s"))
    res = solve_misdp(prob, Settings(bb=BBSettings(
        warmstart=True, warmstartpreoptsol=True, batch_size=4,
        turbo="off")))
    assert abs(res.objval - (-8.0)) < 1e-4
