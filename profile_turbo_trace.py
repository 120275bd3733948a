"""Capture a device trace of one real turbo solve (example_CLS, B=8)."""
import glob, os, time
import numpy as np
import jax
import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.core import turbo as T
from scipsdp_tpu.core.branchbound import solve_misdp
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data
from scipsdp_tpu.utils.config import BBSettings, Settings, resolve_backend_autos

B = 8
prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
dense = densify(prob); data = build_ipm_data(dense); m = dense.nvars
settings = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B)))
root_lb = np.asarray(prob.lb[:m]); root_ub = np.asarray(prob.ub[:m])
solve_misdp(prob, Settings(bb=BBSettings(batch_size=B, node_limit=2*B)))  # warm
T.solve_turbo(dense, prob, settings, root_lb, root_ub, np.inf, None,
              data=data, rounds_per_dispatch=settings.bb.turbo_rounds)
out = "/tmp/turbotrace"
os.makedirs(out, exist_ok=True)
with jax.profiler.trace(out):
    t0 = time.time()
    res = T.solve_turbo(dense, prob, settings, root_lb, root_ub, np.inf,
                        None, data=data,
                        rounds_per_dispatch=settings.bb.turbo_rounds)
    dt = time.time() - t0
print(f"solve {dt*1e3:.0f} ms, nodes={res.nodes} rounds={res.rounds} iters={res.iters} nsolves={res.nsolves}")
print(sorted(glob.glob(out + "/**/*.json.gz", recursive=True))[-1])
