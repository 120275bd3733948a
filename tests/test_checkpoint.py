"""B&B checkpoint/resume tests (capability beyond the reference)."""

import os

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.utils.config import BBSettings, Settings
from scipsdp_tpu.utils.status import SolveStatus

from conftest import INSTANCES


def test_checkpoint_resume(tmp_path):
    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    ck = str(tmp_path / "bb.npz")
    # phase 1: stop early via node limit, checkpointing every batch
    s1 = Settings(bb=BBSettings(node_limit=3, batch_size=2))
    res1 = solve_misdp(prob, s1, checkpoint=ck, checkpoint_every=1)
    assert res1.status == SolveStatus.NODE_LIMIT
    assert os.path.exists(ck)
    # phase 2: resume and finish
    s2 = Settings(bb=BBSettings(batch_size=2))
    res2 = solve_misdp(prob, s2, checkpoint=ck, resume=True)
    assert res2.status == SolveStatus.OPTIMAL
    assert abs(res2.objval - (-8.0)) < 1e-4


def test_resume_finished_checkpoint(tmp_path):
    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    ck = str(tmp_path / "bb.npz")
    res1 = solve_misdp(prob, checkpoint=ck, checkpoint_every=1)
    assert res1.status == SolveStatus.OPTIMAL
    res2 = solve_misdp(prob, checkpoint=ck, resume=True)
    assert res2.status == SolveStatus.OPTIMAL
    assert abs(res2.objval - res1.objval) < 1e-9
