import dataclasses, glob, os
import numpy as np
import jax, jax.numpy as jnp
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data, ipm_solve
from scipsdp_tpu.utils.config import BBSettings, Settings, resolve_backend_autos

prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
dense = densify(prob); data = build_ipm_data(dense); m = dense.nvars
B = 128
base = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B))).ipm
pin = dataclasses.replace(base, gaptol=1e-30, feastol=1e-30,
                          stall_window=10**6, max_iters=10)
lb = np.tile(prob.lb[:m], (B, 1)); ub = np.tile(prob.ub[:m], (B, 1))
lbx = jnp.asarray(np.concatenate([lb, np.zeros((B, 1))], axis=1))
ubx = jnp.asarray(np.concatenate([ub, np.zeros((B, 1))], axis=1))
bb = jnp.asarray(np.tile(np.concatenate([dense.obj, [0.0]]), (B, 1)))
f = jax.jit(lambda b, l, u: ipm_solve(data, b, l, u, settings=pin))
np.asarray(f(bb, lbx, ubx).y)  # warm
os.makedirs("/tmp/jaxtrace", exist_ok=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    out = f(bb, lbx, ubx)
    np.asarray(out.y)
print("trace files:", glob.glob("/tmp/jaxtrace/**/*", recursive=True)[:20])
