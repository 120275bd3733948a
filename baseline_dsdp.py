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
"""

import os
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np
import scipy.linalg as sla

rng = np.random.RandomState(0)
import sys
n, m = 43, 34
if len(sys.argv) > 2:
    n, m = int(sys.argv[1]), int(sys.argv[2])
reps = max(3, min(200, int(2e8 / (n * n * m))))

# SPD S, sparse-ish A_j (CLS constraint matrices are sparse; dense here =
# generous to DSDP)
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
t_solve = timed(lambda: sla.solve_triangular(L, A.reshape(m * n, n).T,
                                             lower=True))
W = sla.solve_triangular(L, A.reshape(m * n, n).T, lower=True)
Wm = rng.randn(m, n * n)
t_gram = timed(lambda: Wm @ Wm.T)
M = Wm @ Wm.T + m * np.eye(m)
t_chol_m = timed(lambda: np.linalg.cholesky(M))
rhs = rng.randn(m)
t_dy = timed(lambda: sla.cho_solve((np.linalg.cholesky(M), True), rhs))
t_probe = timed(lambda: np.linalg.cholesky(S))

# one iteration: factor S, feature solves (x2 directions in predictor-
# corrector), Schur gram, factor M, 2 solves, 2 line-search probes
t_iter = (t_chol_s + 2 * t_solve + t_gram + t_chol_m + 2 * t_dy
          + 2 * t_probe)
print(f"kernels (ms): chol_S {1e3*t_chol_s:.3f}  feat_solve "
      f"{1e3*t_solve:.3f}  gram {1e3*t_gram:.3f}  chol_M "
      f"{1e3*t_chol_m:.3f}  dy {1e3*t_dy:.3f}  probe {1e3*t_probe:.3f}")
print(f"iteration: {1e3*t_iter:.3f} ms")

for iters in (15, 18, 25):
    # +20% problem-load/interface overhead per node (SCIP-SDP re-loads
    # bounds/objective per node through the SDPI)
    t_node = 1.2 * iters * t_iter
    print(f"  {iters} iters/node -> {1e3*t_node:.1f} ms/node = "
          f"{1.0/t_node:.0f} nodes/s")
