"""The production TPU solver configuration, exercised on CPU.

The TPU auto-resolution picks phase32="refine" + step_rule="probe"
(utils/config.py resolve_backend_autos); the CPU defaults are
phase32="off" + step_rule="eigh", so the 200-test CPU suite never ran
the refine control flow or the probe ladder (round-3 verdict weak #5).
The refine tier and probe rule are backend-independent math when the
Mosaic kernel paths are off (use_df32="off", fused_direction="off"), so
this file pins them through end-to-end solves and through the DIMACS
check-tolerance option.
"""

import dataclasses
import os

import numpy as np
import pytest

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.utils.config import BBSettings, IPMSettings, Settings
from scipsdp_tpu.utils.status import SolveStatus

from conftest import INSTANCES

TPU_IPM = IPMSettings(phase32="refine", step_rule="probe", use_df32="off",
                      fused_direction="off")

CASES = [
    ("example_small.dat-s", -8.0),
    ("example_small_ind.dat-s", -18.0),
    ("example_inf.dat-s", "infeasible"),
    ("example_cbf_mix.cbf", 4.0),
    ("example_tightenmatrices.dat-s", -9.0),
]


@pytest.mark.parametrize("name,expect", CASES, ids=[c[0] for c in CASES])
def test_refine_probe_parity(name, expect):
    """e2e solves under the TPU production tier (refine + probe)."""
    prob = read_problem(os.path.join(INSTANCES, name))
    res = solve_misdp(prob, Settings(ipm=TPU_IPM))
    if expect == "infeasible":
        assert res.status == SolveStatus.INFEASIBLE
    else:
        assert res.status == SolveStatus.OPTIMAL, res
        tol = 1e-4 * max(1.0, abs(expect))
        assert abs(res.objval - expect) <= tol, (
            f"{name}: got {res.objval}, expected {expect}")


def test_refine_probe_gondzio():
    """Gondzio correctors under the probe rule: the acceptance test now
    compares probe-certified steps on BOTH sides (advisor r3), so the
    corrected direction can actually be adopted and the solve stays
    correct."""
    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    s = Settings(ipm=dataclasses.replace(TPU_IPM, gondzio=2))
    res = solve_misdp(prob, s)
    assert res.status == SolveStatus.OPTIMAL
    assert abs(res.objval - (-8.0)) <= 1e-4


def test_probe_turbo_path():
    """Device-resident B&B under the TPU tier (turbo forced on)."""
    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    s = Settings(ipm=TPU_IPM, bb=BBSettings(batch_size=4, turbo="on"))
    res = solve_misdp(prob, s)
    assert res.status == SolveStatus.OPTIMAL
    assert abs(res.objval - (-8.0)) <= 1e-4


def test_dimacs_feastol_option():
    """usedimacsfeastol (cons_sdp.c:703-710): the check tolerance scales
    by 1 + sum|obj|; solves stay at parity with the option on."""
    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    s = Settings(bb=BBSettings(usedimacsfeastol=True))
    res = solve_misdp(prob, s)
    assert res.status == SolveStatus.OPTIMAL
    assert abs(res.objval - (-8.0)) <= 1e-4
    # and on the turbo path
    s = Settings(bb=BBSettings(usedimacsfeastol=True, batch_size=4,
                               turbo="on"))
    res = solve_misdp(prob, s)
    assert res.status == SolveStatus.OPTIMAL
    assert abs(res.objval - (-8.0)) <= 1e-4
