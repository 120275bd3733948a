"""End-to-end MISDP solves against the reference's known optima.

Tier-2 analog of the reference's check harness: `make test` runs
check/testset/short.test against short.solu known objectives
(check/check.awk); here each instance is solved by the batched B&B and the
external objective must match within 1e-4 absolute-ish tolerance
(the reference's parity tolerances: feastol = gaptol = 1e-5,
scipsdpdefplugins.c:136-140 — we allow a small multiple since optima are
quoted to 6 digits).

The heavier instances are covered by the benchmark harness (bench.py) and
marked slow here; run with SCIPSDP_TPU_FULL_E2E=1 to include them.
"""

import os

import numpy as np
import pytest

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.utils.config import BBSettings, Settings
from scipsdp_tpu.utils.status import SolveStatus

from conftest import INSTANCES

FULL = bool(os.environ.get("SCIPSDP_TPU_FULL_E2E"))

# (file, known objective or "infeasible")  — check/testset/short.solu
FAST_CASES = [
    ("example_small.dat-s", -8.0),
    ("example_small_cbf.cbf", -8.0),
    ("example_small_ind.dat-s", -18.0),
    ("example_inf.dat-s", "infeasible"),
    ("example_cbf_primal.cbf", 0.75),
    ("example_cbf_mix.cbf", 4.0),
    ("example_cbf_dual.cbf", 4.0),
    ("example_multaggr.cbf", -1.0),
    ("example_diagzeroimpl.cbf", -1.0),
    ("example_tightenmatrices.dat-s", -9.0),
    ("example_rank1_primal.cbf", 0.6537946),
]

SLOW_CASES = [
    ("example_indicator.cip.gz", 6.56155281280000e+05),
    ("example_multaggr2.cbf", 4.0),
    ("example_multaggr3.cbf", 4.0),
    ("example_TT.dat-s.gz", 2.11803),
    ("example_CLS.dat-s.gz", 7.1485),
    ("example_MkP.dat-s.gz", -95.0),
    ("example_rank1_dual.cbf", 0.6537946),
]

CASES = FAST_CASES + (SLOW_CASES if FULL else [])


@pytest.mark.parametrize("name,expect", CASES, ids=[c[0] for c in CASES])
def test_instance_parity(name, expect):
    prob = read_problem(os.path.join(INSTANCES, name))
    res = solve_misdp(prob)
    if expect == "infeasible":
        assert res.status == SolveStatus.INFEASIBLE
    else:
        assert res.status == SolveStatus.OPTIMAL, res
        tol = 1e-4 * max(1.0, abs(expect))
        assert abs(res.objval - expect) <= tol, (
            f"{name}: got {res.objval}, expected {expect}")


def test_deferred_turbo_engagement(instances_dir):
    """On CPU the host loop runs first and hands its frontier to the
    device-resident path once the tree proves large (the chunk compile
    only amortizes on big trees); the handoff must keep the optimum."""
    import os

    from scipsdp_tpu.core import turbo as tmod

    orig = tmod.solve_turbo
    handoffs = []

    def spy(*a, **k):
        handoffs.append(k.get("init_nodes") is not None)
        return orig(*a, **k)

    tmod.solve_turbo = spy
    try:
        prob = read_problem(os.path.join(instances_dir,
                                         "example_TT.dat-s.gz"))
        res = solve_misdp(prob, Settings(bb=BBSettings(batch_size=4)))
    finally:
        tmod.solve_turbo = orig
    assert abs(res.objval - 2.11803) < 1e-4
    assert handoffs == [True]          # engaged once, with a frontier
