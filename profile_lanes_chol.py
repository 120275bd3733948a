"""A/B the lanes-batched kernels vs XLA at IPM shapes on the live TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.ops.pallas_kernels import cholesky_lanes, chol_inverse_lanes

def med(ts): return float(np.median(ts))
rng = np.random.RandomState(0)

def spd(N, n):
    a = rng.randn(N, n, n)
    return jnp.asarray(np.einsum("bij,bkj->bik", a, a) + n * np.eye(n),
                       jnp.float32)

def slope_loop(fn, A0, n1=2, n2=22, reps=3):
    """op in a serial fori_loop; re-SPD between reps via normalize+shift."""
    n = A0.shape[-1]
    eye = jnp.asarray(np.eye(n), jnp.float32)
    def respd(x, i):
        x = jnp.matmul(x, jnp.swapaxes(x, -1, -2))
        mx = jnp.max(jnp.abs(x), axis=(-1, -2), keepdims=True)
        return x / (mx + 1.0) + (1.0 + 1e-6 * i.astype(jnp.float32)) * eye
    def run(nrep, a, s):
        def body(i, a):
            return respd(fn(a + s * eye), i)
        return jnp.mean(lax.fori_loop(0, nrep, body, a))
    f1 = jax.jit(lambda a, s: run(n1, a, s))
    f2 = jax.jit(lambda a, s: run(n2, a, s))
    z = jnp.asarray(0.0, jnp.float32)
    np.asarray(f1(A0, z)); np.asarray(f2(A0, z))
    t1s, t2s = [], []
    for i in range(reps):
        s = jnp.asarray(1e-5 * (i + 1), jnp.float32)
        t0 = time.time(); np.asarray(f1(A0, s)); t1s.append(time.time() - t0)
        t0 = time.time(); np.asarray(f2(A0, s)); t2s.append(time.time() - t0)
    return (med(t2s) - med(t1s)) / (n2 - n1)

def trinv_xla(L):
    eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)

for N, n in [(1280, 43), (80, 43), (256, 34), (16, 43)]:
    A0 = spd(N, n)
    sx = slope_loop(jnp.linalg.cholesky, A0)
    sl = slope_loop(cholesky_lanes, A0)
    print(f"chol    N={N:5d} n={n}: XLA {1e3*sx:7.2f} ms  lanes {1e3*sl:7.2f} ms  "
          f"({sx/max(sl,1e-9):5.1f}x)", flush=True)
    sxi = slope_loop(lambda a: trinv_xla(jnp.linalg.cholesky(a)), A0)
    sli = slope_loop(chol_inverse_lanes, A0)
    print(f"cholinv N={N:5d} n={n}: XLA {1e3*sxi:7.2f} ms  lanes {1e3*sli:7.2f} ms  "
          f"({sxi/max(sli,1e-9):5.1f}x)", flush=True)
