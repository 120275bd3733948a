"""Careful slope microbench of stacked f32/f64 cholesky + congruence at
probe-ladder shapes."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()

def med(ts): return float(np.median(ts))
rng = np.random.RandomState(0)
B = 128

def mk_spd(shape, nn):
    a = rng.randn(*shape, nn, nn)
    return np.einsum('...ij,...kj->...ik', a, a) + nn * np.eye(nn)

def slope_of(fn, a0_np, n1=2, n2=22, reps=3):
    A0 = jnp.asarray(a0_np, jnp.float32) if fn.__name__.startswith('f32') else jnp.asarray(a0_np)
    def run(nrep, a, seed):
        def body(i, carry):
            out = fn(a + (seed + 1e-7 * i + 1e-6 * carry) * jnp.ones_like(a[..., :1, :1]) * jnp.asarray(np.eye(a.shape[-1]), a.dtype))
            return jnp.mean(jnp.abs(out)) * 1e-9
        return lax.fori_loop(0, nrep, body, jnp.asarray(0.0, a.dtype))
    f1 = jax.jit(lambda a, s: run(n1, a, s)); f2 = jax.jit(lambda a, s: run(n2, a, s))
    z = jnp.asarray(0.0, A0.dtype)
    np.asarray(f1(A0, z)); np.asarray(f2(A0, z))
    t1s, t2s = [], []
    for i in range(reps):
        s = jnp.asarray(1e-5 * (i + 1), A0.dtype)
        t0 = time.time(); np.asarray(f1(A0, s)); t1s.append(time.time() - t0)
        t0 = time.time(); np.asarray(f2(A0, s)); t2s.append(time.time() - t0)
    return (med(t2s) - med(t1s)) / (n2 - n1)

def f32_chol(a): return jnp.linalg.cholesky(a)
def f64_chol(a): return jnp.linalg.cholesky(a)
def f32_eigh(a): return jnp.linalg.eigh(a)[1]
def f32_congr(a): return jnp.einsum('...ab,...bc->...ac', a, a)

for name, fn, shape, nn in [
    ("f32 chol (B,43,43)",        f32_chol, (B,), 43),
    ("f32 chol (B,10,43,43)",     f32_chol, (B, 10), 43),
    ("f32 chol (B,10,43,43) B=8", f32_chol, (8, 10), 43),
    ("f64 chol (B,43,43)",        f64_chol, (B,), 43),
    ("f32 eigh (B,43,43)",        f32_eigh, (B,), 43),
    ("f32 matmul (B,10,43,43)",   f32_congr, (B, 10), 43),
]:
    s = slope_of(fn, mk_spd(shape, nn), )
    tot = np.prod(shape)
    print(f"{name:28s}: {1e3*s:8.2f} ms/op   {1e6*s/tot:8.2f} us/matrix", flush=True)
