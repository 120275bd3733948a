"""Writer round-trip tests (readwrite.c analog).

The writers may re-encode bounds as LP rows, so round-trip equivalence is
checked semantically: the root relaxation objective and the full B&B
optimum of the re-read problem must match the original.
"""

import os

import numpy as np
import pytest

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.core.sdpi import SDPInterface
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.models.writers import write_cbf, write_sdpa

from conftest import INSTANCES


def _root_obj(prob):
    iface = SDPInterface(densify(prob))
    res = iface.solve_batch(prob.lb[None, :], prob.ub[None, :])
    assert res.status[0] in (1, 7)
    return float(res.objval[0])


@pytest.mark.parametrize("name", ["example_small.dat-s", "example_inf.dat-s",
                                  "example_tightenmatrices.dat-s"])
def test_sdpa_roundtrip_root(tmp_path, name):
    orig = read_problem(os.path.join(INSTANCES, name))
    out = str(tmp_path / "rt.dat-s")
    write_sdpa(orig, out)
    back = read_problem(out)
    assert back.integral.sum() == orig.integral.sum()
    assert len(back.blocks) == len(orig.blocks)
    np.testing.assert_allclose(_root_obj(back), _root_obj(orig), atol=1e-4)


def test_sdpa_roundtrip_full_solve(tmp_path):
    orig = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    out = str(tmp_path / "rt.dat-s")
    write_sdpa(orig, out)
    back = read_problem(out)
    res = solve_misdp(back)
    assert abs(res.objval - (-8.0)) < 1e-4


def test_sdpa_roundtrip_indicator(tmp_path):
    orig = read_problem(os.path.join(INSTANCES, "example_small_ind.dat-s"))
    out = str(tmp_path / "rt.dat-s")
    write_sdpa(orig, out)
    back = read_problem(out)
    assert len(back.indicators) == 1
    res = solve_misdp(back)
    assert abs(res.objval - (-18.0)) < 1e-4


def test_cbf_roundtrip(tmp_path):
    orig = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    out = str(tmp_path / "rt.cbf")
    write_cbf(orig, out)
    back = read_problem(out)
    np.testing.assert_allclose(_root_obj(back), _root_obj(orig), atol=1e-4)
    res = solve_misdp(back)
    assert abs(res.objval - (-8.0)) < 1e-4


def test_cbf_roundtrip_rank1(tmp_path):
    orig = read_problem(os.path.join(INSTANCES, "example_rank1_primal.cbf"))
    out = str(tmp_path / "rt.cbf")
    write_cbf(orig, out)
    back = read_problem(out)
    assert sum(b.rank1 for b in back.blocks) == sum(
        b.rank1 for b in orig.blocks)
    np.testing.assert_allclose(_root_obj(back), _root_obj(orig), atol=1e-4)
