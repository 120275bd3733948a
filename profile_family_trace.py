"""Capture a device trace of one real turbo solve of a generated family
instance (round-5: diagnose the mkp_12 / cls_32 per-node cliff).

Usage: python profile_family_trace.py [--family mkp_12] [--batch 8]
       [--trace] [--nodes N]

Prints per-dispatch host wall times (separates device cost from
host/relay overhead) and, with --trace, writes a device trace for
profile_trace_agg.py.
"""
import argparse, glob, os, time
import numpy as np
import jax
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.core import turbo as T
from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.models import families as F
from scipsdp_tpu.ops.ipm import build_ipm_data
from scipsdp_tpu.utils.config import BBSettings, Settings, resolve_backend_autos

GENS = {
    "mkp_10": lambda: F.min_k_partition(10, 3, 0.7, seed=1),
    "mkp_12": lambda: F.min_k_partition(12, 3, 0.6, seed=1),
    "cls_22": lambda: F.cardinality_least_squares(22, 44, 7, seed=3),
    "cls_32": lambda: F.cardinality_least_squares(32, 64, 8, seed=5),
    "cls_48": lambda: F.cardinality_least_squares(48, 96, 10, seed=5),
    "cls_64": lambda: F.cardinality_least_squares(64, 128, 12, seed=5),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="mkp_12")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--nodes", type=int, default=200000)
    args = ap.parse_args()

    prob = GENS[args.family]()
    dense = densify(prob)
    data = build_ipm_data(dense)
    m = dense.nvars
    print(f"{args.family}: m={m} buckets={data.nbuckets} "
          f"dims={[tuple(np.shape(a)) for a in data.A]}")
    settings = resolve_backend_autos(
        Settings(bb=BBSettings(batch_size=args.batch,
                               node_limit=args.nodes)))
    root_lb = np.asarray(prob.lb[:m]); root_ub = np.asarray(prob.ub[:m])
    t0 = time.time()
    solve_misdp(prob, Settings(bb=BBSettings(batch_size=args.batch,
                                             node_limit=2 * args.batch)))
    print(f"warm solve {time.time()-t0:.1f}s")

    # instrument the chunk dispatch wall times
    orig = T._chunk_for
    times = []

    def wrapped(*a, **kw):
        fn = orig(*a, **kw)

        def timed(*fa, **fkw):
            t = time.time()
            st, summary = fn(*fa, **fkw)
            s = np.asarray(summary)   # host sync, like the real loop
            times.append(time.time() - t)
            return st, summary
        return timed

    T._chunk_for = wrapped
    try:
        t0 = time.time()
        res = T.solve_turbo(dense, prob, settings, root_lb, root_ub,
                            np.inf, None, data=data,
                            rounds_per_dispatch=settings.bb.turbo_rounds)
        dt = time.time() - t0
    finally:
        T._chunk_for = orig
    print(f"solve {dt:.2f}s nodes={res.nodes} rounds={res.rounds} "
          f"iters={res.iters} nsolves={res.nsolves} obj={res.inc_val}")
    print("per-dispatch wall (s):",
          [round(t, 3) for t in times])

    if args.trace:
        out = f"/tmp/famtrace_{args.family}_{args.batch}"
        os.makedirs(out, exist_ok=True)
        with jax.profiler.trace(out):
            res = T.solve_turbo(dense, prob, settings, root_lb, root_ub,
                                np.inf, None, data=data,
                                rounds_per_dispatch=settings.bb.turbo_rounds)
        print("trace:",
              sorted(glob.glob(out + "/**/*.json.gz", recursive=True))[-1])


if __name__ == "__main__":
    main()
