"""Benchmark: full branch-and-bound throughput on the flagship MISDP.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: B&B nodes per second for a complete solve of example_CLS
(cardinality least squares, BASELINE.json configs[1]) — the reference's
headline "B&B nodes/s" with everything included: batched IPM relaxations,
recovery ladder, heuristics, propagation, pruning.  A warm-up solve with a
small node limit first compiles every device graph so the timed solve
measures steady-state throughput (first-compile is one-off and cached).

Baseline: the reference publishes no timing numbers (BASELINE.md).  The
driver target is >=10x single-thread SCIP-SDP+DSDP nodes/s; we take
100 nodes/s as the DSDP single-thread estimate at this instance size
(43x43 block, 33 vars; DSDP node solves measure ~5-20 ms at this scale),
so vs_baseline = value / 100.0.  `--smoke` uses example_small.
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="small/fast configuration (CPU-friendly)")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    import jax

    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.utils.config import BBSettings, Settings

    if args.smoke:
        path = "/root/reference/instances/example_small.dat-s"
        expect = -8.0
    else:
        path = "/root/reference/instances/example_CLS.dat-s.gz"
        expect = 7.1485
    B = args.batch or 16

    prob = read_problem(path)

    # warm-up: compiles all device graphs (solve + ladder + fused rounding)
    warm = Settings(bb=BBSettings(batch_size=B, node_limit=2 * B))
    solve_misdp(prob, warm)

    # timed: complete solve
    settings = Settings(bb=BBSettings(batch_size=B))
    res = solve_misdp(prob, settings)
    ok = (res.objval is not None and abs(res.objval - expect) < 1e-3)
    value = res.stats.nodes / max(res.stats.wall_time, 1e-9)

    print(json.dumps({
        "metric": "bb_nodes_per_s",
        "value": round(value, 2),
        "unit": f"nodes/s (full solve, {prob.name}, batch={B}, "
                f"{jax.default_backend()}, {res.stats.nodes} nodes, "
                f"objective {'ok' if ok else 'MISMATCH'})",
        "vs_baseline": round(value / 100.0, 3),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
