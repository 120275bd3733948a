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


def test_cip_roundtrip(tmp_path):
    """write_cip -> read_cip preserves the problem (readwrite.c analog)."""
    import numpy as np

    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.models.reader_cip import read_cip
    from scipsdp_tpu.models.writers import write_cip

    prob = read_problem("/root/reference/instances/example_small.dat-s")
    p = str(tmp_path / "rt.cip")
    write_cip(prob, p)
    back = read_cip(p)
    assert back.nvars == prob.nvars
    assert back.nblocks == prob.nblocks
    np.testing.assert_allclose(back.obj, prob.obj)
    np.testing.assert_allclose(back.lb, prob.lb)
    np.testing.assert_allclose(back.ub, prob.ub)
    for b1, b2 in zip(prob.blocks, back.blocks):
        np.testing.assert_allclose(b1.dense_coeff(prob.nvars),
                                   b2.dense_coeff(back.nvars))
        np.testing.assert_allclose(b1.dense_const(), b2.dense_const())


def test_cip_roundtrip_quadratic_indicator(tmp_path):
    import numpy as np

    from scipsdp_tpu.models.problem import (INF, IndicatorLink,
                                            LinearConstraints, MISDP,
                                            QuadConstraint)
    from scipsdp_tpu.models.reader_cip import read_cip
    from scipsdp_tpu.models.writers import write_cip

    lp = LinearConstraints.from_rows([([0, 2], [1.0, 1.0], 2.0, INF)])
    prob = MISDP(
        nvars=3, obj=np.array([1.0, 0.0, 0.0]),
        lb=np.zeros(3), ub=np.array([4.0, 1.0, INF]),
        integral=np.array([False, True, False]), blocks=[],
        lp=lp,
        indicators=[IndicatorLink(binvar=1, slackvar=2, row=0)],
        quadcons=[QuadConstraint(lin_ind=[1], lin_val=[-0.5], qrow=[0, 0],
                                 qcol=[0, 1], qval=[2.0, 1.0],
                                 lhs=-INF, rhs=3.0)],
        name="qi")
    p = str(tmp_path / "qi.cip")
    write_cip(prob, p)
    back = read_cip(p)
    assert len(back.quadcons) == 1
    qc = back.quadcons[0]
    np.testing.assert_allclose(sorted(qc.qval), [1.0, 2.0])
    assert qc.rhs == 3.0 and list(qc.lin_val) == [-0.5]
    assert len(back.indicators) == 1
    assert back.indicators[0].binvar == 1
    assert back.lp.nrows == 1
