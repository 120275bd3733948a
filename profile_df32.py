"""On-TPU accuracy + speed check of the df32 compensated kernels.

Validates that Mosaic does NOT break the error-free transforms (the
XLA:CPU LLVM backend does, via mul->add FMA contraction on the
vectorized path — see tests/test_df32.py), and measures per-call cost
against XLA's emulated-f64 einsum at refine-IPM shapes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
import scipsdp_tpu.ops.df32 as df32

rng = np.random.default_rng(0)

# --- accuracy: the IPM cancellation case (X*S ~ mu*I) ---------------------
n = 43
Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
lamx = np.exp(rng.uniform(-3, 3, n))
mu = 1e-7
X = (Q * lamx) @ Q.T
S = (Q * (mu / lamx)) @ Q.T
G = 8
Xb = np.tile(X, (G, 1, 1)) * (1 + 1e-9 * np.arange(G)[:, None, None])
Sb = np.tile(S, (G, 1, 1))
want = np.einsum("gab,gbc->gac", Xb, Sb)
got = np.asarray(df32.bmm64(jnp.asarray(Xb), jnp.asarray(Sb)))
f32 = np.einsum("gab,gbc->gac", Xb.astype(np.float32),
                Sb.astype(np.float32)).astype(np.float64)
rel = np.abs(got - want).max() / np.abs(want).max()
rel32 = np.abs(f32 - want).max() / np.abs(want).max()
print(f"bmm64 cancellation: df32 rel {rel:.3e}  plain-f32 rel {rel32:.3e}",
      flush=True)

A2 = rng.standard_normal((34, 1849)) * np.exp(rng.uniform(-4, 4, (34, 1849)))
v2 = rng.standard_normal((G, 1849))
wantL = np.einsum("jf,gf->gj", A2, v2)
gotL = np.asarray(df32.contract_long64(jnp.asarray(A2), jnp.asarray(v2)))
relL = np.abs(gotL - wantL).max() / np.abs(wantL).max()
print(f"contract_long64: rel {relL:.3e}", flush=True)

v3 = rng.standard_normal((G, 34))
wantS = np.einsum("jf,gj->gf", A2, v3)
gotS = np.asarray(df32.contract_short64(jnp.asarray(A2), jnp.asarray(v3)))
relS = np.abs(gotS - wantS).max() / np.abs(wantS).max()
print(f"contract_short64: rel {relS:.3e}", flush=True)

# --- speed vs emulated-f64 einsum (IN-GRAPH: chain K ops in one jit so
# the ~29 ms relay dispatch amortizes; data-dependent chaining prevents
# dead-code elimination) -----------------------------------------------------
import functools


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    ts = []
    for i in range(reps):
        a2 = tuple(a * (1.0 + 1e-12 * (i + 1)) for a in args)
        t0 = time.time()
        out = fn(*a2)
        jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def chain(op, k):
    @jax.jit
    def f(a, b):
        for _ in range(k):
            c = op(a, b)
            a = a + 1e-300 * c
        return a
    return f


Xj, Sj = jnp.asarray(Xb), jnp.asarray(Sb)
for name, op in [("f64-einsum",
                  lambda a, b: jnp.einsum("gab,gbc->gac", a, b)),
                 ("df32-bmm64", df32.bmm64)]:
    t8 = timed(chain(op, 16), Xj, Sj, reps=5)
    t40 = timed(chain(op, 256), Xj, Sj, reps=5)
    print(f"bmm (8,43,43) {name}: {(t40-t8)/240*1e3:.3f} ms/op", flush=True)

A2j, v2j = jnp.asarray(A2), jnp.asarray(v2)


def chain_lv(op, k):
    @jax.jit
    def f(m, v):
        out = None
        for _ in range(k):
            o = op(m, v)          # (G, J)
            v = v + 1e-300 * jnp.sum(o, axis=1, keepdims=True)
        return v
    return f


for name, op in [("f64-einsum",
                  lambda m, v: jnp.einsum("jf,gf->gj", m, v)),
                 ("df32-long", df32.contract_long64)]:
    t8 = timed(chain_lv(op, 16), A2j, v2j, reps=5)
    t40 = timed(chain_lv(op, 256), A2j, v2j, reps=5)
    print(f"long (34,1849) {name}: {(t40-t8)/240*1e3:.3f} ms/op", flush=True)

v3j = jnp.asarray(v3)


def chain_sv(op, k):
    @jax.jit
    def f(m, v):
        for _ in range(k):
            o = op(m, v)          # (G, F)
            v = v + 1e-300 * jnp.sum(o, axis=1, keepdims=True)
        return v
    return f


for name, op in [("f64-einsum",
                  lambda m, v: jnp.einsum("jf,gj->gf", m, v)),
                 ("df32-short", df32.contract_short64)]:
    t8 = timed(chain_sv(op, 16), A2j, v3j, reps=5)
    t40 = timed(chain_sv(op, 256), A2j, v3j, reps=5)
    print(f"short (34,1849) {name}: {(t40-t8)/240*1e3:.3f} ms/op", flush=True)
