"""Testset runner — the reference check harness analog.

SCIP-SDP's tier-2 harness (`make test` -> check/check.sh + check.awk)
runs check/testset/short.test and compares against short.solu known
objectives, emitting a status/nodes/time table.  Same here:

    python check.py [--testset short] [--lp-approx] [--time-limit S]

Exit code 0 iff every instance matches its known optimum/status within
the parity tolerance (1e-4 relative — the reference quotes optima to ~6
digits; its own solver tolerances are 1e-5).
"""

import argparse
import os
import sys
import time

REFERENCE = "/root/reference"


def load_solu(path):
    out = {}
    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks:
                continue
            if toks[0] == "=opt=":
                out[toks[1]] = ("opt", float(toks[2]))
            elif toks[0] == "=inf=":
                out[toks[1]] = ("inf", None)
    return out


def find_instance(name):
    base = os.path.join(REFERENCE, "instances")
    for ext in (".dat-s", ".dat-s.gz", ".cbf", ".cbf.gz", ".cip", ".cip.gz"):
        p = os.path.join(base, name + ext)
        if os.path.exists(p):
            return p
    # names in short.test carry relative paths
    for line in open(os.path.join(REFERENCE, "check", "testset",
                                  "short.test")):
        line = line.strip()
        if os.path.basename(line).startswith(name):
            p = os.path.join(REFERENCE, "check", line)
            if os.path.exists(p):
                return p
    return None


def run_families(args):
    """Perf tier: generated CLS/MkP/TT at several sizes (models/families
    mirrors the reference's example families); records nodes/s per size.

    There are no published optima for generated instances; each solve must
    report OPTIMAL with zero gap, and the incumbent is re-verified by the
    independent feasibility checker inside solve_misdp."""
    import json

    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models import families
    from scipsdp_tpu.utils.config import BBSettings, Settings
    from scipsdp_tpu.utils.status import SolveStatus

    cases = [
        ("CLS", lambda s: families.cardinality_least_squares(
            nfeatures=s, nsamples=2 * s, seed=1), (6, 8, 10, 12)),
        ("MkP", lambda s: families.min_k_partition(
            nvertices=s, k=3, density=0.6, seed=1), (6, 7, 8)),
        ("TT", lambda s: families.truss_topology(
            nbars=s, nloads=2, seed=1), (4, 6, 8)),
    ]
    settings = Settings(bb=BBSettings(time_limit=args.time_limit,
                                      batch_size=8))
    print(f"{'family':<8} {'size':>5} {'nvars':>6} {'nodes':>7} "
          f"{'time':>8} {'nodes/s':>9}  status")
    rows = []
    nfail = 0
    for fam, gen, sizes in cases:
        for s in sizes:
            prob = gen(s)
            t0 = time.time()
            res = solve_misdp(prob, settings)
            dt = time.time() - t0
            ok = res.status == SolveStatus.OPTIMAL
            nps = res.stats.nodes / max(dt, 1e-9)
            print(f"{fam:<8} {s:>5} {prob.nvars:>6} {res.stats.nodes:>7} "
                  f"{dt:>7.1f}s {nps:>9.2f}  "
                  f"{res.status.name}{'' if ok else ' FAIL'}")
            rows.append({"family": fam, "size": s, "nvars": prob.nvars,
                         "nodes": res.stats.nodes, "time_s": round(dt, 2),
                         "nodes_per_s": round(nps, 2),
                         "status": res.status.name})
            if not ok:
                nfail += 1
    print(json.dumps(rows))
    return 1 if nfail else 0


def run_testset(settings, solu, label=""):
    """Run every testset instance under ``settings``; returns
    (nfail, rows) and prints the reference-style table."""
    from scipsdp_tpu.core.branchbound import solve_misdp
    from scipsdp_tpu.models.io import read_problem
    from scipsdp_tpu.utils.status import SolveStatus

    print(f"{'instance':<28} {'status':<10} {'objective':>16} "
          f"{'expected':>16} {'nodes':>7} {'time':>8}  result"
          + (f"   [{label}]" if label else ""))
    nfail = 0
    rows = []
    for name, (kind, expect) in solu.items():
        path = find_instance(name)
        if path is None:
            print(f"{name:<28} MISSING")
            nfail += 1
            continue
        t0 = time.time()
        try:
            res = solve_misdp(read_problem(path), settings)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<28} ERROR      {str(e)[:40]}")
            nfail += 1
            continue
        finally:
            # the reference harness runs one PROCESS per instance; here one
            # process runs all 18, and the accumulated per-shape compiled
            # executables exhaust LLVM JIT memory maps in LP mode (observed:
            # "LLVM compilation error: Cannot allocate memory" after ~12
            # instances).  Executables are per-instance anyway — drop them.
            import jax

            from scipsdp_tpu.core import sdpi as _sdpi
            from scipsdp_tpu.core import turbo as _turbo
            _sdpi._FUSED_JIT_CACHE.clear()
            _turbo._CHUNK_CACHE.clear()
            jax.clear_caches()
        dt = time.time() - t0
        if kind == "inf":
            ok = res.status == SolveStatus.INFEASIBLE
            print(f"{name:<28} {res.status.name:<10} {'-':>16} "
                  f"{'infeasible':>16} {res.stats.nodes:>7} {dt:>7.1f}s  "
                  f"{'ok' if ok else 'FAIL'}")
        else:
            # Parity tolerance is 1e-4 relative, NOT the 1e-5 solver
            # feastol: short.solu quotes ~6 significant digits, and on the
            # rank-1 instances the reference's incumbent convention
            # (PSD-feasible at 1e-5, quadratic-minor slack <= feastol)
            # and ours (rank-1 exact, PSD slack inside the 1e-4 DIMACS
            # band) legitimately differ by ~1e-5 around the same optimum
            # (measured: 0.65378254 exact-rank-1 vs 0.6537946 quoted;
            # see core/branchbound.py try_candidate note).
            tol = 1e-4 * max(1.0, abs(expect))
            ok = (res.status == SolveStatus.OPTIMAL
                  and res.objval is not None
                  and abs(res.objval - expect) <= tol)
            obj = f"{res.objval:.8g}" if res.objval is not None else "-"
            print(f"{name:<28} {res.status.name:<10} {obj:>16} "
                  f"{expect:>16.8g} {res.stats.nodes:>7} {dt:>7.1f}s  "
                  f"{'ok' if ok else 'FAIL'}")
        if not ok:
            nfail += 1
        rows.append({"instance": name, "status": res.status.name,
                     "objective": res.objval, "nodes": res.stats.nodes,
                     "iters": res.stats.ipm_iterations,
                     "solver_calls": res.stats.solver_calls,
                     "time_s": round(dt, 1), "ok": bool(ok)})
    print(f"\n{len(solu) - nfail}/{len(solu)} instances at parity")
    return nfail, rows


def run_settings_sweep(args, solu):
    """The reference check harness's settings-tier sweep
    (/root/reference/Makefile:538-553 over settings/scip-*.set): run the
    full testset under each tier file through the SCIP-style ``.set``
    loader and assert parity per tier, recording the behavioral
    differences (nodes / iterations / solver calls) the knobs produce.
    Writes SETTINGS_SWEEP.json."""
    import glob
    import json

    from scipsdp_tpu.utils.config import BBSettings, Settings
    from scipsdp_tpu.utils.paramfile import load_settings_file

    tiers = sorted(
        glob.glob(os.path.join(REFERENCE, "settings", "scip-*.set")),
        key=lambda p: p) + [os.path.join(REFERENCE, "settings",
                                         "lp_approx.set")]
    base = Settings(bb=BBSettings(time_limit=args.time_limit))
    summary = []
    total_fail = 0
    for tier in tiers:
        label = os.path.basename(tier)
        settings = load_settings_file(tier, base=base)
        nfail, rows = run_testset(settings, solu, label=label)
        total_fail += nfail
        summary.append({
            "tier": label,
            "solve_sdps": settings.solve_sdps,
            "branching_rule": settings.bb.branching_rule,
            "heuristic_rand": settings.bb.heuristic_rand,
            "diving_freq": settings.bb.diving_freq,
            "parity": f"{len(solu) - nfail}/{len(solu)}",
            "nodes": sum(r["nodes"] for r in rows),
            "iters": sum(r["iters"] for r in rows),
            "solver_calls": sum(r["solver_calls"] for r in rows),
            "time_s": round(sum(r["time_s"] for r in rows), 1),
            "rows": rows,
        })
        with open("SETTINGS_SWEEP.json", "w") as f:
            json.dump(summary, f, indent=1)
    print(f"\n{'tier':<16} {'mode':<5} {'branch':<14} {'parity':<7} "
          f"{'nodes':>7} {'iters':>7} {'solves':>7} {'time':>8}")
    for s in summary:
        mode = "SDP" if s["solve_sdps"] else "LP"
        print(f"{s['tier']:<16} {mode:<5} {s['branching_rule']:<14} "
              f"{s['parity']:<7} {s['nodes']:>7} {s['iters']:>7} "
              f"{s['solver_calls']:>7} {s['time_s']:>7.1f}s")
    return 1 if total_fail else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--testset", default="short")
    ap.add_argument("--lp-approx", action="store_true")
    ap.add_argument("--time-limit", type=float, default=1800.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--families", action="store_true",
                    help="perf tier: generated CLS/MkP/TT at several "
                         "sizes; prints a nodes/s scaling table")
    ap.add_argument("--settings-sweep", action="store_true",
                    help="run the testset under every reference settings "
                         "tier (settings/scip-*.set + lp_approx.set)")
    ap.add_argument("--phase32", default=None,
                    choices=["off", "on", "refine"],
                    help="override the IPM mixed-precision mode (A/B aid)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.families:
        return run_families(args)

    from scipsdp_tpu.utils.config import BBSettings, Settings

    solu = load_solu(os.path.join(REFERENCE, "check", "testset",
                                  f"{args.testset}.solu"))
    if args.settings_sweep:
        return run_settings_sweep(args, solu)

    settings = Settings(
        bb=BBSettings(time_limit=args.time_limit),
        solve_sdps=0 if args.lp_approx else 1,
    )
    if args.phase32 is not None:
        import dataclasses as _dc
        settings = _dc.replace(
            settings, ipm=_dc.replace(settings.ipm, phase32=args.phase32))

    nfail, _rows = run_testset(settings, solu)
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
