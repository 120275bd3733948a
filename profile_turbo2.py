"""Round-4 budget attribution, part 2: the non-device second.

profile_turbo.py found: device compute = 8 rounds x 64 ms = 0.52 s of a
1.54 s CLS solve.  This script locates the other ~1.0 s:

  a. solve_misdp total vs solve_turbo called directly (pre-phase cost)
  b. idle-round cost: chunk(k=32) on an ALREADY-EMPTY frontier
  c. fetch-tail cost: the ~12 sequential scalar np.asarray fetches
     solve_turbo performs after the loop, measured as-is
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()

from scipsdp_tpu.core import turbo as _turbo
from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data
from scipsdp_tpu.utils.config import (BBSettings, Settings,
                                      resolve_backend_autos)

B = 8
prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
dense = densify(prob)
data = build_ipm_data(dense)
m = dense.nvars
settings = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B)))
root_lb = np.asarray(prob.lb[:m], dtype=np.float64)
root_ub = np.asarray(prob.ub[:m], dtype=np.float64)

# warm every graph
solve_misdp(prob, Settings(bb=BBSettings(batch_size=B,
                                         node_limit=2 * B)))
solve_misdp(prob, Settings(bb=BBSettings(batch_size=B)))

# ---- a. solve_misdp vs direct solve_turbo -------------------------------
t0 = time.time()
res = solve_misdp(prob, Settings(bb=BBSettings(batch_size=B)))
t_full = time.time() - t0
t0 = time.time()
tres = _turbo.solve_turbo(dense, prob, settings, root_lb, root_ub,
                          np.inf, None, data=data,
                          rounds_per_dispatch=settings.bb.turbo_rounds)
t_turbo = time.time() - t0
print(f"[a] solve_misdp {t_full:.3f} s vs solve_turbo direct "
      f"{t_turbo:.3f} s -> pre/post-phase {t_full - t_turbo:.3f} s "
      f"({tres.nodes} nodes, {tres.rounds} rounds)", flush=True)

# ---- b. idle-round cost -------------------------------------------------
N = max(settings.bb.turbo_capacity, 8 * B)
chunk = _turbo._chunk_for(settings, dense.integral, B, data)
empty = _turbo.TurboState(
    flb=jnp.zeros((N, m)), fub=jnp.zeros((N, m)),
    fbound=jnp.full((N,), np.inf),
    fwarm=jnp.zeros((N, m)), fwok=jnp.zeros((N,), bool),
    fvalid=jnp.zeros((N,), bool),
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
key = jax.random.PRNGKey(1)
_, s0 = chunk(data, empty, key, nl, k=32)
np.asarray(s0)
ts = []
for i in range(3):
    e2 = empty._replace(inc_val=jnp.asarray(np.inf + 0.0) + i)
    t0 = time.time()
    _, sm = chunk(data, e2, jax.random.fold_in(key, i), nl, k=32)
    np.asarray(sm)
    ts.append(time.time() - t0)
print(f"[b] 32 idle rounds (empty frontier): {1e3*np.median(ts):.1f} ms "
      f"per dispatch", flush=True)

# ---- c. fetch-tail cost -------------------------------------------------
stf, _ = chunk(data, empty, key, nl, k=1)
t0 = time.time()
has_inc = bool(stf.has_inc)
fb = np.asarray(jnp.where(stf.fvalid, stf.fbound, np.inf))
inc_val = float(stf.inc_val)
_ = np.asarray(stf.inc_y)
for fld in ("nodes", "rounds", "iters", "nsolves", "nheur", "ndirect",
            "nunsolved"):
    _ = int(getattr(stf, fld))
t_tail = time.time() - t0
print(f"[c] solve_turbo fetch tail (11 sequential fetches): "
      f"{1e3*t_tail:.0f} ms", flush=True)

# ---- d. device transfers of the initial state ---------------------------
t0 = time.time()
st0 = _turbo.TurboState(
    flb=jnp.asarray(np.zeros((N, m))), fub=jnp.asarray(np.zeros((N, m))),
    fbound=jnp.asarray(np.full((N,), np.inf)),
    fwarm=jnp.zeros((N, m)), fwok=jnp.zeros((N,), bool),
    fvalid=jnp.asarray(np.zeros((N,), bool)),
    inc_val=jnp.asarray(np.inf), inc_y=jnp.zeros((m,)),
    has_inc=jnp.asarray(False),
    nodes=jnp.asarray(0, jnp.int32), rounds=jnp.asarray(0, jnp.int32),
    iters=jnp.asarray(0, jnp.int32), nsolves=jnp.asarray(0, jnp.int32),
    nheur=jnp.asarray(0, jnp.int32), ndirect=jnp.asarray(0, jnp.int32),
    nunsolved=jnp.asarray(0, jnp.int32),
    npruned_inf=jnp.asarray(0, jnp.int32),
    overflow=jnp.asarray(False),
)
jax.block_until_ready(st0)
print(f"[d] initial state build+transfer: {1e3*(time.time()-t0):.0f} ms",
      flush=True)
