"""Benchmark: batched SDP node-relaxation throughput on the flagship MISDP.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: steady-state B&B node relaxations solved per second by the batched
interior-point solver on example_CLS (cardinality least squares,
BASELINE.json configs[1]) — the direct analog of the reference's "SDP
relaxation solves per second" with DSDP as the back-end.

Baseline: the reference publishes no timing numbers (BASELINE.md).  The
driver target is >=10x single-thread SCIP-SDP+DSDP nodes/s; we take
100 node solves/s as the DSDP single-thread estimate for instances of this
size (43x43 block, 33 vars; DSDP root solves measure ~5-20 ms at this
scale), so vs_baseline = value / 100.0.  `--smoke` runs a smaller, faster
configuration for CI-style checks.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="small/fast configuration (CPU-friendly)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scipsdp_tpu.core.sdpi import SDPInterface
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.models.problem import densify
    from scipsdp_tpu.utils.config import Settings

    if args.smoke:
        path = "/root/reference/instances/example_small.dat-s"
        B = args.batch or 8
    else:
        path = "/root/reference/instances/example_CLS.dat-s.gz"
        B = args.batch or 32

    prob = read_problem(path)
    iface = SDPInterface(densify(prob), Settings())
    m = iface.m

    # root relaxation solution guides realistic branching-style bounds
    # (solved at batch shape B so the device graph is compiled only once)
    yroot = iface.solve_batch(np.tile(prob.lb, (B, 1)),
                              np.tile(prob.ub, (B, 1))).y[0]

    def make_batch(seed):
        # simulate a B&B node batch: root bounds plus one-sided branching
        # bounds (floor/ceil around the root relaxation values) — the
        # realistic shape of open-node batches
        lb = np.tile(prob.lb, (B, 1))
        ub = np.tile(prob.ub, (B, 1))
        r = np.random.default_rng(seed)
        ints = np.where(prob.integral)[0]
        for i in range(1, B):
            if not len(ints):
                break
            picks = r.choice(ints, size=min(2, len(ints)), replace=False)
            for j in picks:
                v = yroot[j]
                if r.integers(0, 2):
                    ub[i, j] = min(ub[i, j], np.floor(v))
                else:
                    lb[i, j] = max(lb[i, j], np.floor(v) + 1.0)
        return lb, ub

    # compile (full production path: fused solve + rounding heuristics +
    # recovery ladder, mixed precision on TPU)
    lb, ub = make_batch(0)
    res = iface.solve_batch(lb, ub, rounding_seed=0)
    nconv = int(np.isin(res.status, (1, 7)).sum())

    # steady state
    times = []
    for rep in range(args.reps):
        lb, ub = make_batch(rep + 1)
        t = time.time()
        res = iface.solve_batch(lb, ub, rounding_seed=rep + 1)
        times.append(time.time() - t)
    dt = min(times)
    value = B / dt

    print(json.dumps({
        "metric": "node_relaxations_per_s",
        "value": round(value, 2),
        "unit": f"relaxations/s (batch={B}, {prob.name}, "
                f"{jax.default_backend()}, decided {nconv}/{B})",
        "vs_baseline": round(value / 100.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
