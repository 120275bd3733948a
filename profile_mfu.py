"""MFU / roofline accounting for the IPM hot kernels (VERDICT r3 item 5).

Measures achieved FLOP/s of the two FLOP-carrying stages of the batched
IPM — the W-feature congruences (Schur assembly) and the batched Gram
product M = W W^T — at testset and production shapes, against v5e peaks:
  MXU f32 (bf16x3 passes): ~ 49 TFLOP/s  (197 TFLOP/s bf16 / ~4)
  HBM: ~ 820 GB/s
Prints a table for PERFORMANCE.md.  Relay-safe slope method.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()

PEAK_F32 = 49e12
PEAK_BW = 820e9

def med(x): return float(np.median(x))
rng = np.random.RandomState(0)

def slope(fn, args, n1=4, n2=40, reps=3):
    """Per-iteration seconds of fn via a two-length loop slope.

    Two hardware gotchas (both produced NEGATIVE round-5 measurements):
    the axon relay serves IDENTICAL dispatches from a result cache, so
    every call must receive a fresh scalar ``c``; and XLA hoists a
    loop-invariant fn(*a) out of fori_loop, so the body must make the
    operand iteration-dependent.  The (1 + c + eps*i) scale is a scalar
    multiply that fuses into the consumer's operand read (no extra HBM
    pass over large operands)."""
    def run(nrep, c, *a):
        def body(i, acc):
            a0 = a[0] * (1.0 + c + 1e-9 * i.astype(jnp.float32))
            out = fn(a0, *a[1:])
            return acc + jnp.sum(out)
        return lax.fori_loop(0, nrep, body, jnp.asarray(0.0, jnp.float32))
    f1 = jax.jit(lambda c, *a: run(n1, c, *a))
    f2 = jax.jit(lambda c, *a: run(n2, c, *a))
    z = jnp.float32(0.0)
    np.asarray(f1(z, *args)); np.asarray(f2(z, *args))
    t1, t2 = [], []
    for i in range(reps):
        c1 = jnp.float32(1e-6 * (i + 1)); c2 = jnp.float32(1e-6 * (i + 51))
        t0 = time.time(); np.asarray(f1(c1, *args)); t1.append(time.time() - t0)
        t0 = time.time(); np.asarray(f2(c2, *args)); t2.append(time.time() - t0)
    return (med(t2) - med(t1)) / (n2 - n1)

print(f"{'stage':<22} {'shape':<26} {'ms':>8} {'GFLOP':>8} "
      f"{'TFLOP/s':>8} {'MFU%':>6} {'GB':>7} {'BW%':>5}")

for (nm, B, mp, n, K) in [
    ("testset CLS", 8, 34, 43, 1),
    ("family cls_22", 32, 46, 45, 1),
    ("family cls_48 B32", 32, 98, 97, 1),
    ("production", 64, 130, 129, 1),
    ("production wide", 128, 130, 129, 1),
]:
    # loop counts scaled so the slope's time delta clears the relay's
    # ~ms dispatch jitter: sub-ms-per-iter small shapes need hundreds
    # of loop iterations to resolve (negative slopes otherwise)
    n2_it = 400 if n <= 45 else 40
    n1_it = n2_it // 10
    # W features: P = Lx^T A (B,K,mp,n,n); W = P Ls^{-T}
    A = jnp.asarray(rng.randn(K, mp, n, n), jnp.float32)
    Lx = jnp.asarray(rng.randn(B, K, n, n), jnp.float32)
    Ls = jnp.asarray(rng.randn(B, K, n, n), jnp.float32)
    def wfeat(A, Lx, Ls):
        with jax.default_matmul_precision("float32"):
            P = jnp.einsum("xkba,kjbc->xkjac", Lx, A)
            W = jnp.einsum("xkjab,xkcb->xkjac", P, Ls)
        return W.reshape(B, mp, -1)
    s = slope(wfeat, (A, Lx, Ls), n1=n1_it, n2=n2_it)
    fl = 2 * 2 * B * K * mp * n**3
    by = 4 * (2 * B * K * mp * n * n + K * mp * n * n + 2 * B * K * n * n)
    print(f"{'W-features':<22} {nm + f' B{B} n{n}':<26} {1e3*s:8.2f} "
          f"{fl/1e9:8.2f} {fl/s/1e12:8.2f} {100*fl/s/PEAK_F32:6.1f} "
          f"{by/1e9:7.3f} {100*by/s/PEAK_BW:5.1f}")
    # Schur Gram
    F = K * n * n + 2 * mp
    W = jnp.asarray(rng.randn(B, mp, F), jnp.float32)
    def gram(W):
        with jax.default_matmul_precision("float32"):
            return jnp.einsum("bif,bjf->bij", W, W)
    s = slope(gram, (W,), n1=n1_it, n2=n2_it)
    fl = 2 * B * mp * mp * F
    by = 4 * (B * mp * F + B * mp * mp)
    print(f"{'Schur Gram':<22} {nm + f' B{B} F{F}':<26} {1e3*s:8.2f} "
          f"{fl/1e9:8.2f} {fl/s/1e12:8.2f} {100*fl/s/PEAK_F32:6.1f} "
          f"{by/1e9:7.3f} {100*by/s/PEAK_BW:5.1f}")
    # batched f32 Cholesky (X/S factor), XLA path
    Aspd = jnp.asarray(
        np.einsum("bkij,bklj->bkil", np.asarray(Lx), np.asarray(Lx))
        + n * np.eye(n, dtype=np.float32), jnp.float32)
    s = slope(lambda a: jnp.linalg.cholesky(
        a + 1e-3 * jnp.eye(n, dtype=jnp.float32)), (Aspd,),
        n1=n1_it, n2=n2_it)
    fl = B * K * n**3 // 3
    print(f"{'Cholesky (XLA)':<22} {nm + f' B{B} n{n}':<26} {1e3*s:8.2f} "
          f"{fl/1e9:8.2f} {fl/s/1e12:8.2f} {100*fl/s/PEAK_F32:6.1f} "
          f"{'':>7} {'':>5}")
