import numpy as np, jax, jax.numpy as jnp
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.core import turbo as T
from scipsdp_tpu.models.families import cardinality_least_squares
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data
from scipsdp_tpu.utils.config import BBSettings, Settings, resolve_backend_autos

B = 32
prob = cardinality_least_squares(32, 64, 8, seed=5)
dense = densify(prob); data = build_ipm_data(dense); m = dense.nvars
import dataclasses as _dc, sys
settings = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B)))
if len(sys.argv) > 1:
    settings = _dc.replace(settings, ipm=_dc.replace(
        settings.ipm, schur_refine=int(sys.argv[1])))
if len(sys.argv) > 2:
    settings = _dc.replace(settings, ipm=_dc.replace(
        settings.ipm, stall_window=int(sys.argv[2])))
lb = np.asarray(prob.lb[:m]); ub = np.asarray(prob.ub[:m])
N = settings.bb.turbo_capacity
chunk = T._chunk_for(settings, dense.integral, B, data)
flb = np.ones((N, m)); fub = np.zeros((N, m))
flb[0], fub[0] = lb, ub
fb = np.full((N,), np.inf); fb[0] = -np.inf
valid = np.zeros((N,), bool); valid[0] = True
st = T.TurboState(
    flb=jnp.asarray(flb), fub=jnp.asarray(fub), fbound=jnp.asarray(fb),
    fwarm=jnp.zeros((N, m)), fwok=jnp.zeros((N,), bool),
    fvalid=jnp.asarray(valid),
    inc_val=jnp.asarray(np.inf), inc_y=jnp.zeros((m,)),
    has_inc=jnp.asarray(False),
    nodes=jnp.asarray(0, jnp.int32), rounds=jnp.asarray(0, jnp.int32),
    iters=jnp.asarray(0, jnp.int32), nsolves=jnp.asarray(0, jnp.int32),
    nheur=jnp.asarray(0, jnp.int32), ndirect=jnp.asarray(0, jnp.int32),
    nunsolved=jnp.asarray(0, jnp.int32),
    npruned_inf=jnp.asarray(0, jnp.int32), overflow=jnp.asarray(False),
)
import time
for it in range(4):
    t0 = time.time()
    st, summary = chunk(data, st, jax.random.PRNGKey(it), jnp.asarray(10**6, jnp.int32), k=32)
    s = np.asarray(summary)
    print(f"chunk {it}: {time.time()-t0:.1f}s any_valid={s[0]} overflow={s[1]} "
          f"nunsolved={s[2]:.0f} nodes={s[3]:.0f} rounds={s[4]:.0f} iters={s[5]:.0f}", flush=True)
    if not s[0] or s[1]:
        break
