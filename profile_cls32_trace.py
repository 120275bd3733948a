"""Trace one turbo chunk at cls_32 (n=65) B=32 — 131 s for 159 nodes in
the family bench needs explaining."""
import glob, os, time
import numpy as np, jax
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
settings = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B)))
lb = np.asarray(prob.lb[:m]); ub = np.asarray(prob.ub[:m])
T.solve_turbo(dense, prob, settings, lb, ub, np.inf, None, data=data,
              rounds_per_dispatch=settings.bb.turbo_rounds)  # warm
out = "/tmp/cls32trace"
os.makedirs(out, exist_ok=True)
with jax.profiler.trace(out):
    t0 = time.time()
    res = T.solve_turbo(dense, prob, settings, lb, ub, np.inf, None,
                        data=data,
                        rounds_per_dispatch=settings.bb.turbo_rounds)
    dt = time.time() - t0
print(f"solve {dt:.1f} s nodes={res.nodes} rounds={res.rounds} "
      f"iters={res.iters} nsolves={res.nsolves} nunsolved={res.nunsolved}")
print(sorted(glob.glob(out + "/**/*.json.gz", recursive=True))[-1])
