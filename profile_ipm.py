"""Per-iteration IPM cost measurement on the live backend (round-3 perf).

Measures marginal per-iteration device cost of the batched IPM at
example_CLS shapes by differencing dispatches with different iteration
budgets (gaptol pinned to 0 so the while_loop runs to max_iters), for:

  * f64   : phase32 off (every kernel emulated f64)
  * f32dir: phase32 on with switch ~ 0 (f32 directions, f64 residuals)

plus the idle-turbo-chunk dispatch overhead.  Relay gotchas respected:
vary inputs between timed calls, force np.asarray fetches, one TPU job.
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data, ipm_solve
from scipsdp_tpu.utils.config import IPMSettings
import dataclasses

B = 8
prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
dense = densify(prob)
data = build_ipm_data(dense)
m = dense.nvars
mp = m + 1
print(f"CLS: m={m}, blocks={dense.blocksizes}, buckets="
      f"{[a.shape for a in data.A]}", flush=True)

rng = np.random.default_rng(0)


root_lb = np.asarray(prob.lb[:m], dtype=np.float64)
root_ub = np.asarray(prob.ub[:m], dtype=np.float64)


def boxes(jit_i):
    lb = np.tile(root_lb, (B, 1))
    ub = np.tile(root_ub, (B, 1))
    # vary bounds per timed call (relay caches identical dispatches)
    k = jit_i % m
    ub[:, k] = np.minimum(ub[:, k], 1.0 - 1e-9 * (jit_i + 1))
    lbx = np.concatenate([lb, np.zeros((B, 1))], axis=1)
    ubx = np.concatenate([ub, np.zeros((B, 1))], axis=1)
    b = np.tile(np.concatenate([dense.obj, [0.0]]), (B, 1))
    return jnp.asarray(b), jnp.asarray(lbx), jnp.asarray(ubx)


def timed(fn, *args):
    t0 = time.time()
    out = fn(*args)
    iters = int(np.asarray(out.iters))
    y = np.asarray(out.y)  # force fetch
    return time.time() - t0, iters


def measure(name, s, k_small, k_large, reps=3):
    f_small = jax.jit(lambda b, lb, ub: ipm_solve(
        data, b, lb, ub, settings=dataclasses.replace(s, max_iters=k_small)))
    f_large = jax.jit(lambda b, lb, ub: ipm_solve(
        data, b, lb, ub, settings=dataclasses.replace(s, max_iters=k_large)))
    # warm-up compiles
    timed(f_small, *boxes(1000))
    timed(f_large, *boxes(2000))
    ts, tl, its, itl = [], [], [], []
    for i in range(reps):
        dt, it = timed(f_small, *boxes(i))
        ts.append(dt); its.append(it)
        dt, it = timed(f_large, *boxes(100 + i))
        tl.append(dt); itl.append(it)
    ts, tl = np.median(ts), np.median(tl)
    dits = np.median(itl) - np.median(its)
    per = (tl - ts) / max(dits, 1)
    print(f"{name}: small {ts*1e3:.1f} ms @{np.median(its)} it, "
          f"large {tl*1e3:.1f} ms @{np.median(itl)} it -> "
          f"{per*1e3:.2f} ms/iter", flush=True)
    return per


base = IPMSettings(gaptol=1e-30, feastol=1e-30, phase32="off",
                   step_rule="power")
measure("f64 (phase32 off)", base, 10, 30)

s32 = dataclasses.replace(base, phase32="on", phase32_switch=1e-30)
measure("f32 directions (phase32 on, switch~0)", s32, 10, 30)

# idle turbo chunk: dispatch + scalar-cond overhead only
from scipsdp_tpu.core.turbo import TurboState, _chunk_for
from scipsdp_tpu.utils.config import Settings, BBSettings

st_set = Settings(bb=BBSettings(batch_size=B))
from scipsdp_tpu.utils.config import resolve_backend_autos
st_set = resolve_backend_autos(st_set)
chunk = _chunk_for(st_set, dense.integral, B, data)
N = max(st_set.bb.turbo_capacity, 8 * B)
st = TurboState(
    flb=jnp.zeros((N, m)), fub=jnp.zeros((N, m)),
    fbound=jnp.full((N,), np.inf), fwarm=jnp.zeros((N, m)),
    fwok=jnp.zeros((N,), bool), fvalid=jnp.zeros((N,), bool),
    inc_val=jnp.asarray(np.inf), inc_y=jnp.zeros((m,)),
    has_inc=jnp.asarray(False), nodes=jnp.asarray(0, jnp.int32),
    rounds=jnp.asarray(0, jnp.int32), iters=jnp.asarray(0, jnp.int32),
    nsolves=jnp.asarray(0, jnp.int32), nheur=jnp.asarray(0, jnp.int32),
    ndirect=jnp.asarray(0, jnp.int32),
    nunsolved=jnp.asarray(0, jnp.int32),
    npruned_inf=jnp.asarray(0, jnp.int32),
    overflow=jnp.asarray(False))
nl = jnp.asarray(10**6, jnp.int32)
key = jax.random.PRNGKey(0)
st2, summ = chunk(data, st, key, nl, k=8)
np.asarray(summ)
times = []
for i in range(4):
    st = st._replace(inc_val=jnp.asarray(float(i)))  # vary input
    t0 = time.time()
    st2, summ = chunk(data, st, jax.random.fold_in(key, i), nl, k=8)
    np.asarray(summ)
    times.append(time.time() - t0)
print(f"idle turbo chunk (k=8): {np.median(times)*1e3:.1f} ms/dispatch",
      flush=True)
