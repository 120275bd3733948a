"""Ground the bench.py baseline denominator: single-thread DSDP nodes/s.

The reference publishes no timing numbers (BASELINE.md), and DSDP itself
is not installed here, so the "single-thread SCIP-SDP+DSDP nodes/s at
CLS scale" denominator is DERIVED from measured single-thread LAPACK
kernel costs on this host for DSDP's per-iteration op mix at the
example_CLS shapes (one 43x43 block, m = 33 dual variables):

  per IPM iteration (sdpisolver_dsdp.c solve path -> DSDP5.8 dual
  scaling; see also Benson&Ye DSDP5 report):
    - factor S (dense Cholesky, n=43)
    - m back-solves S^{-1} A_j  (triangular solves, n x n RHS)
    - Schur complement M_ij = tr(A_i S^{-1} A_j S^{-1})   (m^2/2 traces;
      computed here as an (m, n^2) x (n^2, m) Gram — flop-equivalent,
      BLAS3-friendly, i.e. a GENEROUS lower bound on DSDP's cost)
    - factor M (Cholesky, m x m), solve for dy
    - line search: Cholesky probe of the stepped S

  per node: iterations x iteration cost + problem-load overhead.
  Iteration count: 15-25 typical for gaptol 1e-5 at these sizes (our
  f64 CPU IPM, which matches reference iteration counts across the
  testset, averages ~18 per CLS node solve).

Prints the measured kernel table and the implied nodes/s bracket.
Run with OPENBLAS_NUM_THREADS=1 for the single-thread figure.

Importable: ``iteration_cost(n, m)`` returns the measured per-iteration
seconds; ``baseline_nodes_per_s(n, m)`` anchors the absolute level to
BASELINE.md's 100 nodes/s at the CLS shape (n=43, m=34) and scales it by
the measured per-size op-mix ratio — the per-size DSDP denominator for
bench_families.py's ``vs_baseline`` columns.
"""

import os
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np
import scipy.linalg as sla

_CLS_SHAPE = (43, 34)
_BASELINE_CLS_NODES_PER_S = 100.0   # BASELINE.md "Baseline denominator"
_cache = {}


def _kernels(n, m, verbose=False):
    rng = np.random.RandomState(0)
    reps = max(3, min(200, int(2e8 / (n * n * m))))

    # SPD S, sparse-ish A_j (CLS constraint matrices are sparse; dense
    # here = generous to DSDP)
    Q = rng.randn(n, n)
    S = Q @ Q.T + n * np.eye(n)
    A = rng.randn(m, n, n)
    A = A + np.swapaxes(A, 1, 2)

    def timed(f, reps=reps):
        f()
        t0 = time.time()
        for _ in range(reps):
            f()
        return (time.time() - t0) / reps

    L = np.linalg.cholesky(S)
    t_chol_s = timed(lambda: np.linalg.cholesky(S))
    t_solve = timed(lambda: sla.solve_triangular(
        L, A.reshape(m * n, n).T, lower=True))
    Wm = rng.randn(m, n * n)
    t_gram = timed(lambda: Wm @ Wm.T)
    M = Wm @ Wm.T + m * np.eye(m)
    t_chol_m = timed(lambda: np.linalg.cholesky(M))
    rhs = rng.randn(m)
    t_dy = timed(lambda: sla.cho_solve((np.linalg.cholesky(M), True), rhs))
    t_probe = timed(lambda: np.linalg.cholesky(S))
    if verbose:
        print(f"kernels (ms): chol_S {1e3*t_chol_s:.3f}  feat_solve "
              f"{1e3*t_solve:.3f}  gram {1e3*t_gram:.3f}  chol_M "
              f"{1e3*t_chol_m:.3f}  dy {1e3*t_dy:.3f}  probe "
              f"{1e3*t_probe:.3f}")
    # one iteration: factor S, feature solves (x2 directions in
    # predictor-corrector), Schur gram, factor M, 2 solves, 2 line-search
    # probes
    return (t_chol_s + 2 * t_solve + t_gram + t_chol_m + 2 * t_dy
            + 2 * t_probe)


def iteration_cost(n, m, verbose=False):
    """Measured single-thread DSDP-op-mix seconds per IPM iteration."""
    key = (int(n), int(m))
    if key not in _cache:
        _cache[key] = _kernels(*key, verbose=verbose)
    return _cache[key]


_SIZES_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BASELINE_SIZES.json")


def baseline_nodes_per_s(n, m):
    """Per-size DSDP denominator: BASELINE.md's 100 nodes/s at the CLS
    shape, scaled by the measured per-size iteration-cost ratio (the
    iteration COUNT is roughly size-independent at fixed gaptol, so the
    op-mix ratio is the nodes/s ratio).

    Prefers the calibrated table (BASELINE_SIZES.json, written by
    ``python baseline_dsdp.py --calibrate`` on a QUIET host with
    interleaved ref/size measurement): live measurement under load
    drifts — round-5 family runs recorded a non-monotonic denominator
    (5.2 nodes/s at n=65 vs 18.0 at n=97) because the n=65 sample ran
    while the test suite had both vCPUs."""
    key = f"{int(n)}x{int(m)}"
    try:
        import json
        with open(_SIZES_FILE) as f:
            tab = json.load(f)["sizes"]
        if key in tab:
            return tab[key]
    except (OSError, KeyError, ValueError):
        pass
    t_ref = iteration_cost(*_CLS_SHAPE)
    t_sz = iteration_cost(n, m)
    return _BASELINE_CLS_NODES_PER_S * t_ref / t_sz


def calibrate(sizes, reps=3):
    """Interleave ref-shape and per-size measurement so slow host-load
    drift cancels in the ratio; median over ``reps`` passes; persist."""
    import json
    out = {}
    for (n, m) in sizes:
        ratios = []
        for _ in range(reps):
            t_ref = _kernels(*_CLS_SHAPE)
            t_sz = _kernels(n, m)
            ratios.append(t_ref / t_sz)
        val = _BASELINE_CLS_NODES_PER_S * float(np.median(ratios))
        out[f"{n}x{m}"] = round(val, 2)
        print(f"n={n} m={m}: {val:.2f} nodes/s "
              f"(ratio spread {min(ratios):.3g}-{max(ratios):.3g})")
    with open(_SIZES_FILE, "w") as f:
        json.dump({"anchor_cls_nodes_per_s": _BASELINE_CLS_NODES_PER_S,
                   "method": "interleaved op-mix ratio, median of "
                             f"{reps}", "sizes": out}, f, indent=1)
    print(f"wrote {_SIZES_FILE}")
    return out


def main():
    import sys
    if "--calibrate" in sys.argv:
        # every (n_blk, nvars) the family/relax benches use
        calibrate([(43, 34), (29, 29), (37, 37), (45, 45), (10, 45),
                   (12, 66), (6, 10), (8, 14), (65, 65), (97, 97),
                   (129, 129)])
        return
    n, m = _CLS_SHAPE
    if len(sys.argv) > 2:
        n, m = int(sys.argv[1]), int(sys.argv[2])
    t_iter = iteration_cost(n, m, verbose=True)
    print(f"iteration: {1e3*t_iter:.3f} ms")
    for iters in (15, 18, 25):
        # +20% problem-load/interface overhead per node (SCIP-SDP
        # re-loads bounds/objective per node through the SDPI)
        t_node = 1.2 * iters * t_iter
        print(f"  {iters} iters/node -> {1e3*t_node:.1f} ms/node = "
              f"{1.0/t_node:.0f} nodes/s")
    print(f"anchored per-size baseline: "
          f"{baseline_nodes_per_s(n, m):.1f} nodes/s")


if __name__ == "__main__":
    main()
