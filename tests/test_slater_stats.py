"""Per-node Slater accounting (sdpi.c slatercheck; table_slater.c)."""

import os

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.utils.config import BBSettings, Settings
from scipsdp_tpu.utils.statistics import format_relax_statistics


def test_slatercheck_counts_every_node(instances_dir):
    prob = read_problem(os.path.join(instances_dir, "example_small.dat-s"))
    res = solve_misdp(prob, Settings(bb=BBSettings(slatercheck=1,
                                                   batch_size=4)))
    assert abs(res.objval - (-8.0)) < 1e-4
    s = res.stats
    total = s.slater_holds + s.slater_fails + s.slater_undecided
    assert total == s.nodes > 0
    table = format_relax_statistics(s)
    assert "Slater condition" in table


def test_slatercheck_off_keeps_counters_zero(instances_dir):
    prob = read_problem(os.path.join(instances_dir, "example_small.dat-s"))
    res = solve_misdp(prob, Settings(bb=BBSettings(batch_size=4)))
    s = res.stats
    assert s.slater_holds + s.slater_fails + s.slater_undecided == 0
    assert "Slater condition" not in format_relax_statistics(s)
