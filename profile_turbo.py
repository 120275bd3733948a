"""Round-4 budget attribution: where do the ~38 ms/node go?

Decomposes the turbo (device-resident B&B) per-node cost on the live
backend into measured components:

  1. real solve:   nodes, rounds, iters, wall  ->  ms/round, iters/round
  2. dispatch:     no-op jitted call round-trip (relay latency)
  3. per-round:    chunk(k2) - chunk(k1) on a saturated frontier
  4. IPM-only:     ipm_solve at a pinned iteration budget (slope+intercept)
  5. evaluate:     standalone replica of the per-iteration f64 residual
                   pass (the one cost center no round-3 ablation touched)
  6. machinery:    per-round minus IPM at matched iterations

Relay gotchas respected (PERFORMANCE.md): vary inputs between timed
calls, force fetches with np.asarray, median of repeats.
"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()

from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.core.turbo import TurboState, _chunk_for
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data, ipm_solve
from scipsdp_tpu.utils.config import (BBSettings, Settings,
                                      resolve_backend_autos)

B = 8
prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
dense = densify(prob)
data = build_ipm_data(dense)
m = dense.nvars
mp = m + 1
print(f"CLS: m={m}, blocks={list(dense.blocksizes)}, "
      f"P={data.G.shape[0]}, backend={jax.default_backend()}", flush=True)

settings = resolve_backend_autos(
    Settings(bb=BBSettings(batch_size=B)))
ipms = settings.ipm
print(f"resolved: phase32={ipms.phase32} step_rule={ipms.step_rule} "
      f"use_df32={ipms.use_df32} fused={ipms.fused_direction}", flush=True)

root_lb = np.asarray(prob.lb[:m], dtype=np.float64)
root_ub = np.asarray(prob.ub[:m], dtype=np.float64)


def med(ts):
    return float(np.median(ts))


# ---- 1. real solve ------------------------------------------------------
warm = Settings(bb=BBSettings(batch_size=B, node_limit=2 * B))
solve_misdp(prob, warm)
res = solve_misdp(prob, Settings(bb=BBSettings(batch_size=B)))
st = res.stats
wall = st.wall_time
rounds = st.relax_solves          # turbo maps rounds -> relax_solves
iters = st.ipm_iterations
nodes = st.nodes
print(f"\n[1] real solve: {nodes} nodes, {rounds} rounds, {iters} iters, "
      f"{wall:.2f} s -> {1e3*wall/max(nodes,1):.1f} ms/node, "
      f"{1e3*wall/max(rounds,1):.1f} ms/round, "
      f"{iters/max(rounds,1):.1f} iters/round, "
      f"{nodes/max(rounds,1):.2f} live nodes/round", flush=True)

# ---- 2. dispatch round-trip --------------------------------------------
xs = [jnp.asarray(np.random.randn(8) + i) for i in range(12)]
noop = jax.jit(lambda x: x + 1.0)
np.asarray(noop(xs[0]))
ts = []
for i in range(1, 11):
    t0 = time.time()
    np.asarray(noop(xs[i]))
    ts.append(time.time() - t0)
print(f"\n[2] no-op dispatch: {1e3*med(ts):.1f} ms median", flush=True)

# ---- 3. per-round cost on a saturated frontier --------------------------
N = max(settings.bb.turbo_capacity, 8 * B)
chunk = _chunk_for(settings, dense.integral, B, data)


def fresh_state(jit_i):
    """Frontier seeded with 8*B perturbed root boxes: every round in the
    chunk selects a full batch of live nodes."""
    rng = np.random.RandomState(jit_i)
    flb = np.zeros((N, m))
    fub = np.zeros((N, m))
    fb = np.full((N,), np.inf)
    valid = np.zeros((N,), bool)
    for i in range(8 * B):
        lb = root_lb.copy()
        ub = root_ub.copy()
        # tiny per-instance perturbation (defeats relay result caching)
        ub = ub - 1e-9 * rng.rand(m)
        flb[i], fub[i] = lb, ub
        fb[i] = -np.inf
        valid[i] = True
    return TurboState(
        flb=jnp.asarray(flb), fub=jnp.asarray(fub), fbound=jnp.asarray(fb),
        fwarm=jnp.zeros((N, m)), fwok=jnp.zeros((N,), bool),
        fvalid=jnp.asarray(valid),
        inc_val=jnp.asarray(np.inf), inc_y=jnp.zeros((m,)),
        has_inc=jnp.asarray(False),
        nodes=jnp.asarray(0, jnp.int32), rounds=jnp.asarray(0, jnp.int32),
        iters=jnp.asarray(0, jnp.int32), nsolves=jnp.asarray(0, jnp.int32),
        nheur=jnp.asarray(0, jnp.int32), ndirect=jnp.asarray(0, jnp.int32),
        nunsolved=jnp.asarray(0, jnp.int32),
        npruned_inf=jnp.asarray(0, jnp.int32),
        overflow=jnp.asarray(False),
    )


nl = jnp.asarray(10**6, jnp.int32)
key = jax.random.PRNGKey(0)


def run_chunk(jit_i, k):
    st0 = fresh_state(jit_i)
    t0 = time.time()
    stf, summary = chunk(data, st0, jax.random.fold_in(key, jit_i), nl, k=k)
    np.asarray(summary)[:4]
    dt = time.time() - t0
    return dt, int(np.asarray(stf.iters)), int(np.asarray(stf.nodes))

run_chunk(900, 1)
run_chunk(901, 3)
t1s, t3s, i1s, i3s = [], [], [], []
for i in range(3):
    dt, it, nd = run_chunk(10 + i, 1)
    t1s.append(dt); i1s.append(it)
    dt, it, nd = run_chunk(20 + i, 3)
    t3s.append(dt); i3s.append(it)
per_round = (med(t3s) - med(t1s)) / 2
iters_round = (med(i3s) - med(i1s)) / 2
print(f"\n[3] saturated chunk: k=1 {1e3*med(t1s):.0f} ms "
      f"({med(i1s):.0f} iters), k=3 {1e3*med(t3s):.0f} ms "
      f"({med(i3s):.0f} iters) -> {1e3*per_round:.1f} ms/round at "
      f"{iters_round:.1f} iters/round", flush=True)

# ---- 4. IPM-only: slope + intercept ------------------------------------
pin = dataclasses.replace(ipms, gaptol=1e-30, feastol=1e-30,
                          stall_window=10**6)


def boxes(jit_i):
    lb = np.tile(root_lb, (B, 1))
    ub = np.tile(root_ub, (B, 1))
    ub[:, jit_i % m] -= 1e-9 * (jit_i + 1)
    lbx = np.concatenate([lb, np.zeros((B, 1))], axis=1)
    ubx = np.concatenate([ub, np.zeros((B, 1))], axis=1)
    b = np.tile(np.concatenate([dense.obj, [0.0]]), (B, 1))
    return jnp.asarray(b), jnp.asarray(lbx), jnp.asarray(ubx)


def t_ipm(n_iters, reps=3):
    s = dataclasses.replace(pin, max_iters=n_iters)
    f = jax.jit(lambda b, lb, ub: ipm_solve(data, b, lb, ub, settings=s))
    f(*boxes(800 + n_iters))
    ts = []
    for i in range(reps):
        a = boxes(i + 13 * n_iters)
        t0 = time.time()
        out = f(*a)
        np.asarray(out.y)
        ts.append(time.time() - t0)
    return med(ts)

t01 = t_ipm(1)
t11 = t_ipm(11)
t21 = t_ipm(21)
slope = (t21 - t01) / 20
inter = t01 - slope
print(f"\n[4] ipm_solve: 1 it {1e3*t01:.0f} ms, 11 it {1e3*t11:.0f} ms, "
      f"21 it {1e3*t21:.0f} ms -> {1e3*slope:.2f} ms/iter, "
      f"intercept {1e3*inter:.0f} ms (presolve+init+eval0+out+dispatch)",
      flush=True)

# ---- 5. evaluate replica (the f64 residual pass, per iteration) ---------
NB = data.nbuckets
pad_diag = tuple(data.dimmask[t][None, :, :] for t in range(NB))
pad_outer = tuple(pad_diag[t][..., :, None] & pad_diag[t][..., None, :]
                  for t in range(NB))
P = data.G.shape[0]


def eval_replica(y, X, S, xl, sl, xlb, slb, xub, sub, b, lbv, ubv):
    Gs = jnp.broadcast_to(data.G[None], (B,) + data.G.shape)
    hs = jnp.broadcast_to(data.h[None], (B, P))
    Z = tuple(jnp.einsum("kjab,xj->xkab", data.A[t], y) - data.C[t][None]
              for t in range(NB))
    Rp = tuple(jnp.where(pad_outer[t], Z[t] - S[t], 0.0) for t in range(NB))
    Gy = jnp.einsum("xpm,xm->xp", Gs, y)
    rpl = Gy - hs - sl
    rplb = (y - lbv) - slb
    rpub = (ubv - y) - sub
    AstarX = sum(jnp.einsum("kjab,xkba->xj", data.A[t], X[t])
                 for t in range(NB))
    rd = b - AstarX - jnp.einsum("xpm,xp->xm", Gs, xl) - xlb + xub
    gsdp = sum(jnp.sum(jnp.where(pad_outer[t], X[t] * S[t], 0.0),
                       axis=(1, 2, 3)) for t in range(NB))
    gap = (gsdp + jnp.sum(xl * sl, axis=1) + jnp.sum(xlb * slb, axis=1)
           + jnp.sum(xub * sub, axis=1))
    dobj = jnp.sum(b * y, axis=1)
    CX = sum(jnp.sum(jnp.where(pad_outer[t], data.C[t][None] * X[t], 0.0),
                     axis=(1, 2, 3)) for t in range(NB))
    GTxl = jnp.einsum("xpm,xp->xm", Gs, xl)
    pobj = (CX + jnp.sum(hs * xl, axis=1) + jnp.sum(lbv * xlb, axis=1)
            - jnp.sum(ubv * xub, axis=1)
            - jnp.sum(y * (AstarX + GTxl - b), axis=1) * 0.0)
    pinf = jnp.max(jnp.abs(rd), axis=1)
    dinf = jnp.max(jnp.stack([jnp.max(jnp.abs(Rp[t]), axis=(1, 2, 3))
                              for t in range(NB)]), axis=0)
    return gap + dobj + pobj + pinf + dinf


def eval_loop(n, *args):
    def body(i, acc):
        return acc + eval_replica(*args) * (1.0 + 1e-12 * i)
    return jax.lax.fori_loop(0, n, body, jnp.zeros((B,)))


def mk_eval_args(jit_i):
    rng = np.random.RandomState(jit_i)
    y = jnp.asarray(rng.randn(B, mp))
    X = tuple(jnp.asarray(rng.randn(B, *data.A[t].shape[0:1],
                                    *data.A[t].shape[2:]))
              for t in range(NB))
    S = tuple(jnp.asarray(rng.randn(*np.shape(X[t]))) for t in range(NB))
    xl = jnp.asarray(rng.rand(B, P)); sl = jnp.asarray(rng.rand(B, P))
    xlb = jnp.asarray(rng.rand(B, mp)); slb = jnp.asarray(rng.rand(B, mp))
    xub = jnp.asarray(rng.rand(B, mp)); sub = jnp.asarray(rng.rand(B, mp))
    b = jnp.asarray(rng.randn(B, mp))
    lbv = jnp.asarray(rng.randn(B, mp)); ubv = lbv + 1.0
    return (y, X, S, xl, sl, xlb, slb, xub, sub, b, lbv, ubv)


f_ev1 = jax.jit(lambda *a: eval_loop(2, *a))
f_ev2 = jax.jit(lambda *a: eval_loop(22, *a))
np.asarray(f_ev1(*mk_eval_args(0)))
np.asarray(f_ev2(*mk_eval_args(1)))
e1, e2 = [], []
for i in range(3):
    a = mk_eval_args(100 + i)
    t0 = time.time(); np.asarray(f_ev1(*a)); e1.append(time.time() - t0)
    a = mk_eval_args(200 + i)
    t0 = time.time(); np.asarray(f_ev2(*a)); e2.append(time.time() - t0)
per_eval = (med(e2) - med(e1)) / 20
print(f"\n[5] evaluate replica (all-f64 residual pass): "
      f"{1e3*per_eval:.2f} ms/iteration", flush=True)

# ---- 6. summary ---------------------------------------------------------
ipm_at_round = inter + slope * iters_round
print(f"\n[6] BUDGET at {iters_round:.1f} iters/round:")
print(f"    per-round measured        {1e3*per_round:.1f} ms")
print(f"    ipm (intercept+slope*it)  {1e3*ipm_at_round:.1f} ms")
print(f"      of which evaluate       {1e3*per_eval*iters_round:.1f} ms")
print(f"      of which intercept      {1e3*inter:.1f} ms")
print(f"    machinery (round - ipm)   {1e3*(per_round-ipm_at_round):.1f} ms")
print(f"    real-solve ms/round       {1e3*wall/max(rounds,1):.1f} ms",
      flush=True)
