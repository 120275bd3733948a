"""Mesh sharding and multi-host scaffolding tests (8 virtual CPU devices)."""

import numpy as np

import jax

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data
from scipsdp_tpu.parallel.mesh import make_mesh, sharded_solver
from scipsdp_tpu.parallel.multihost import partition_root, sync_bounds
from scipsdp_tpu.utils.config import IPMSettings

from conftest import INSTANCES
import os


def test_sharded_solver_matches_single():
    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    data = build_ipm_data(densify(prob))
    mesh = make_mesh(8, ("nodes", "blocks"))
    solve = sharded_solver(data, IPMSettings(), mesh)
    B = 8
    lb = np.tile(np.concatenate([prob.lb, [0.0]]), (B, 1))
    ub = np.tile(np.concatenate([prob.ub, [0.0]]), (B, 1))
    b = np.tile(np.concatenate([prob.obj, [0.0]]), (B, 1))
    import jax.numpy as jnp
    out = solve(jnp.asarray(b), jnp.asarray(lb), jnp.asarray(ub))
    stat = np.asarray(out.status)
    dobj = np.asarray(out.dobj)
    assert (stat == 1).all()
    np.testing.assert_allclose(dobj, dobj[0] * np.ones(B), rtol=1e-6)
    np.testing.assert_allclose(dobj[0], -8.77733878, atol=1e-4)


def test_partition_root_covers_box():
    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    parts = partition_root(prob, 4)
    assert len(parts) == 4
    # partitions are disjoint on the split variables and solving each part
    # and taking the best reproduces the global optimum
    best = np.inf
    for lb, ub in parts:
        import dataclasses
        sub = dataclasses.replace(prob, lb=lb, ub=ub)
        res = solve_misdp(sub)
        if res.objval is not None:
            best = min(best, res.objval)
    assert abs(best - (-8.0)) < 1e-4


def test_sync_bounds_single_process():
    inc, bound, loads = sync_bounds(-5.0, -7.0, 3)
    assert inc == -5.0 and bound == -7.0 and loads.tolist() == [3]


def test_bb_with_mesh_matches_single():
    """use_mesh=True runs the whole B&B with node batches sharded over the
    8-device mesh and reproduces the optimum."""
    from scipsdp_tpu.utils.config import BBSettings, Settings

    prob = read_problem(os.path.join(INSTANCES, "example_small.dat-s"))
    res = solve_misdp(prob, Settings(use_mesh=True,
                                     bb=BBSettings(batch_size=8)))
    assert abs(res.objval - (-8.0)) < 1e-4


def test_turbo_sharded_over_mesh():
    """Device-resident B&B with the node batch sharded over the mesh's
    "nodes" axis (multi-chip turbo): same optimum as single-device."""
    import numpy as np

    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.utils.config import BBSettings, Settings

    prob = read_problem("/root/reference/instances/example_small.dat-s")
    res = solve_misdp(prob, Settings(
        use_mesh=True, bb=BBSettings(batch_size=8)))
    assert abs(res.objval - (-8.0)) < 1e-4
    assert res.stats.nodes > 0


def test_mesh_scaling_same_optimum():
    """Measured multi-chip scaling (virtual 8-CPU-device mesh): one CLS
    family instance solved at mesh sizes 1/2/4/8 must reach the SAME
    optimum; per-size nodes/s is reported for the scaling record
    (PERFORMANCE.md).  Real multi-chip hardware is unavailable in CI —
    this validates correctness of every mesh-size code path."""
    import time

    from scipsdp_tpu.models import families
    from scipsdp_tpu.utils.config import BBSettings, Settings

    prob = families.cardinality_least_squares(nfeatures=6, nsamples=12,
                                              seed=1)
    objs, rates = {}, {}
    for ndev in (1, 2, 4, 8):
        s = Settings(use_mesh=ndev > 1, mesh_devices=ndev,
                     bb=BBSettings(batch_size=8))
        t0 = time.time()
        res = solve_misdp(prob, s)
        dt = time.time() - t0
        assert res.status.name == "OPTIMAL", (ndev, res.status)
        objs[ndev] = res.objval
        rates[ndev] = res.stats.nodes / max(dt, 1e-9)
    ref = objs[1]
    for ndev, v in objs.items():
        assert abs(v - ref) < 1e-5 * max(1.0, abs(ref)), objs
    print("mesh scaling nodes/s:", {k: round(v, 2)
                                    for k, v in rates.items()})
