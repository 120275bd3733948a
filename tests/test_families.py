"""Problem-family generator smoke tests (the benchmark model zoo)."""

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.families import (
    cardinality_least_squares,
    min_k_partition,
    truss_topology,
)
from scipsdp_tpu.utils.config import BBSettings, Settings
from scipsdp_tpu.utils.status import SolveStatus


def test_cls_family_solves():
    prob = cardinality_least_squares(nfeatures=5, nsamples=8, k=2)
    res = solve_misdp(prob, Settings(bb=BBSettings(node_limit=200)))
    assert res.status == SolveStatus.OPTIMAL
    assert res.objval >= -1e-9   # least-squares epigraph is nonnegative


def test_tt_family_solves():
    prob = truss_topology(nbars=4, nloads=1)
    res = solve_misdp(prob, Settings(bb=BBSettings(node_limit=200)))
    assert res.status in (SolveStatus.OPTIMAL, SolveStatus.INFEASIBLE)


def test_mkp_family_solves():
    prob = min_k_partition(nvertices=5, k=2)
    res = solve_misdp(prob, Settings(bb=BBSettings(node_limit=200)))
    assert res.status == SolveStatus.OPTIMAL
