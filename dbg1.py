import dataclasses
import numpy as np, jax, jax.numpy as jnp
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data, ipm_solve
from scipsdp_tpu.utils.config import BBSettings, Settings, resolve_backend_autos
B = 8
prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
dense = densify(prob); data = build_ipm_data(dense); m = dense.nvars
s = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B))).ipm
lb = np.tile(prob.lb[:m], (B, 1)); ub = np.tile(prob.ub[:m], (B, 1))
lbx = jnp.asarray(np.concatenate([lb, np.zeros((B, 1))], axis=1))
ubx = jnp.asarray(np.concatenate([ub, np.zeros((B, 1))], axis=1))
bb = jnp.asarray(np.tile(np.concatenate([dense.obj, [0.0]]), (B, 1)))
out = jax.jit(lambda b, l, u: ipm_solve(data, b, l, u, settings=s))(bb, lbx, ubx)
print("status", np.asarray(out.status))
print("dobj", np.asarray(out.dobj))
print("iters", np.asarray(out.iters))
