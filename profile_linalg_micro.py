"""Microbench batched small linalg primitives at CLS shapes on the live
backend.  Relay-safe method: run the op N times inside one jitted
fori_loop (serial data dependency), fetch one scalar; slope between
N=2 and N=22 gives per-op device time."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()

def med(ts): return float(np.median(ts))
rng = np.random.RandomState(0)
B, n, mp = 128, 43, 34

def looped(op, prep):
    """op: x (B,n,n) -> (B,n,n); prep regularizes between reps."""
    def run(nrep, a0):
        def body(i, a):
            return prep(op(a), i)
        return jnp.sum(lax.fori_loop(0, nrep, body, a0))
    return run

def slope(run, a0_fn, n1=2, n2=22, reps=3):
    f1 = jax.jit(lambda a: run(n1, a)); f2 = jax.jit(lambda a: run(n2, a))
    np.asarray(f1(a0_fn(0))); np.asarray(f2(a0_fn(1)))
    t1s, t2s = [], []
    for i in range(reps):
        a = a0_fn(10 + i); t0 = time.time(); np.asarray(f1(a)); t1s.append(time.time() - t0)
        a = a0_fn(20 + i); t0 = time.time(); np.asarray(f2(a)); t2s.append(time.time() - t0)
    return (med(t2s) - med(t1s)) / (n2 - n1)

def spd0(i, nn, dt):
    a = rng.randn(B, nn, nn) + 1e-6 * i
    m = np.einsum('bij,bkj->bik', a, a) + nn * np.eye(nn)
    return jnp.asarray(m, dtype=dt)

eye_n = np.eye(n); eye_mp = np.eye(mp)

def respd(x, i, nn):
    # re-symmetrize + shift so the op stays well-posed through the loop
    x = 0.5 * (x + jnp.swapaxes(x, -1, -2))
    mx = jnp.max(jnp.abs(x), axis=(-1, -2), keepdims=True)
    return x / (mx + 1.0) + (1.0 + 1e-6 * i.astype(x.dtype)) * jnp.asarray(np.eye(x.shape[-1]), x.dtype)

cases = []
for dt in (jnp.float32, jnp.float64):
    dn = str(np.dtype(dt))
    cases += [
        (f"{dn} cholesky n={n}", looped(jnp.linalg.cholesky, lambda x, i: respd(x, i, n)), lambda i, d=dt: spd0(i, n, d)),
        (f"{dn} cholesky n={mp}", looped(jnp.linalg.cholesky, lambda x, i: respd(x, i, mp)), lambda i, d=dt: spd0(i, mp, d)),
        (f"{dn} trisolve n={n} k={n}", looped(lambda a: lax.linalg.triangular_solve(a, a, left_side=True, lower=True), lambda x, i: respd(x, i, n)), lambda i, d=dt: spd0(i, n, d)),
        (f"{dn} eigh n={n}", looped(lambda a: jnp.linalg.eigh(a)[1], lambda x, i: respd(x, i, n)), lambda i, d=dt: spd0(i, n, d)),
        (f"{dn} matmul n={n}", looped(lambda a: a @ a, lambda x, i: respd(x, i, n)), lambda i, d=dt: spd0(i, n, d)),
        (f"{dn} exp n={n}", looped(lambda a: jnp.exp(-jnp.abs(a)) + a, lambda x, i: respd(x, i, n)), lambda i, d=dt: spd0(i, n, d)),
    ]
for name, run, a0 in cases:
    s = slope(run, a0)
    print(f"{name:26s}: {1e3*s:8.2f} ms/op (B={B})  {1e6*s/B:8.2f} us/inst", flush=True)
