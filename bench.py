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
    import functools

    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.models.problem import densify
    from scipsdp_tpu.ops.ipm import build_ipm_data, ipm_solve
    from scipsdp_tpu.utils.config import IPMSettings

    if args.smoke:
        path = "/root/reference/instances/example_small.dat-s"
        B = args.batch or 8
    else:
        path = "/root/reference/instances/example_CLS.dat-s.gz"
        B = args.batch or 32

    prob = read_problem(path)
    data = build_ipm_data(densify(prob))
    settings = IPMSettings()
    solve = jax.jit(functools.partial(ipm_solve, settings=settings))

    rng = np.random.default_rng(0)
    m = data.nvars

    # root relaxation solution guides realistic branching-style bounds
    def root_solution():
        lb0 = np.concatenate([prob.lb, [0.0]])[None, :]
        ub0 = np.concatenate([prob.ub, [0.0]])[None, :]
        b0 = np.concatenate([prob.obj, [0.0]])[None, :]
        out = solve(data, jnp.asarray(b0), jnp.asarray(lb0), jnp.asarray(ub0))
        return np.asarray(out.y)[0, :m]

    yroot = None

    def make_batch(seed):
        # simulate a B&B node batch: root bounds plus one-sided branching
        # bounds (floor/ceil around the root relaxation values) — the
        # realistic shape of open-node batches
        nonlocal_yroot = yroot
        lb = np.tile(np.concatenate([prob.lb, [0.0]]), (B, 1))
        ub = np.tile(np.concatenate([prob.ub, [0.0]]), (B, 1))
        r = np.random.default_rng(seed)
        ints = np.where(prob.integral)[0]
        for i in range(1, B):
            if not len(ints):
                break
            picks = r.choice(ints, size=min(2, len(ints)), replace=False)
            for j in picks:
                v = nonlocal_yroot[j]
                if r.integers(0, 2):
                    ub[i, j] = min(ub[i, j], np.floor(v))
                else:
                    lb[i, j] = max(lb[i, j], np.floor(v) + 1.0)
        b = np.tile(np.concatenate([prob.obj, [0.0]]), (B, 1))
        return jnp.asarray(b), jnp.asarray(lb), jnp.asarray(ub)

    yroot = root_solution()

    # compile
    b, lb, ub = make_batch(0)
    out = solve(data, b, lb, ub)
    jax.block_until_ready(out.dobj)
    nconv = int((np.asarray(out.status) == 1).sum())

    # steady state
    times = []
    for rep in range(args.reps):
        b, lb, ub = make_batch(rep + 1)
        t = time.time()
        out = solve(data, b, lb, ub)
        jax.block_until_ready(out.dobj)
        times.append(time.time() - t)
    dt = min(times)
    value = B / dt

    print(json.dumps({
        "metric": "node_relaxations_per_s",
        "value": round(value, 2),
        "unit": f"relaxations/s (batch={B}, {prob.name}, "
                f"{jax.default_backend()}, converged {nconv}/{B})",
        "vs_baseline": round(value / 100.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
