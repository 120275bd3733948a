"""Attribute a warm solve_misdp() call's wall time to phases: solver
construction (presolve/densify/data upload), root propagation, turbo
state init, chunk dispatch(es), and the result tail (round-5 verdict
item 4: bench wall 1.48 s vs 0.81 s device — find the host/relay half).

Usage: python profile_solve_phases.py [--batch 8] [--runs 3]
"""
import argparse, time
import numpy as np
import jax
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.core import branchbound as BB
from scipsdp_tpu.core import turbo as T
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.utils.config import BBSettings, Settings

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=8)
ap.add_argument("--runs", type=int, default=3)
args = ap.parse_args()

prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
settings = Settings(bb=BBSettings(batch_size=args.batch))

# instrument phases
marks = []


def mark(name, t0):
    marks.append((name, time.time() - t0))
    return time.time()


orig_solver = BB._Solver
orig_init = T._init_state
orig_chunk_for = T._chunk_for


class SolverSpy(orig_solver):
    def __init__(self, *a, **kw):
        t0 = time.time()
        super().__init__(*a, **kw)
        mark("solver_ctor", t0)


def init_spy(N, m, K):
    fn = orig_init(N, m, K)

    def wrapped(*a):
        t0 = time.time()
        st = fn(*a)
        jax.block_until_ready(st.flb)
        mark("turbo_init", t0)
        return st
    return wrapped


def chunk_spy(*a, **kw):
    fn = orig_chunk_for(*a, **kw)

    def wrapped(*fa, **fkw):
        t0 = time.time()
        st, summary = fn(*fa, **fkw)
        s = np.asarray(summary)
        mark("chunk+fetch", t0)
        return st, summary
    return wrapped


BB._Solver = SolverSpy
T._init_state = init_spy
T._chunk_for = chunk_spy

# warm (compiles)
t0 = time.time()
BB.solve_misdp(prob, Settings(bb=BBSettings(batch_size=args.batch,
                                            node_limit=2 * args.batch)))
print(f"warm {time.time()-t0:.1f}s")
marks.clear()

best = None
for run in range(args.runs):
    t0 = time.time()
    res = BB.solve_misdp(prob, settings)
    wall = time.time() - t0
    acc = {}
    for name, dt in marks:
        acc[name] = acc.get(name, 0.0) + dt
    other = wall - sum(acc.values())
    print(f"run {run}: wall {wall*1e3:.0f} ms  nodes={res.stats.nodes} "
          f"obj={res.objval:.5f}  "
          + "  ".join(f"{k}={v*1e3:.0f}ms" for k, v in acc.items())
          + f"  other={other*1e3:.0f}ms")
    marks.clear()
    if best is None or wall < best:
        best = wall
print(f"best wall: {best*1e3:.0f} ms -> "
      f"{res.stats.nodes/best:.1f} nodes/s")
