"""Per-IPM-iteration cost vs batch width at CLS shapes (v5e).

If the slope is flat in B, per-node cost divides by B at family scale
and the fused-iteration work should target kernel count, not flops.
"""
import dataclasses, time
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
dense = densify(prob)
data = build_ipm_data(dense)
m = dense.nvars

def med(ts): return float(np.median(ts))

for B in (8, 32, 128, 512):
    settings = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B)))
    pin = dataclasses.replace(settings.ipm, gaptol=1e-30, feastol=1e-30,
                              stall_window=10**6)
    def boxes(jit_i):
        lb = np.tile(prob.lb[:m], (B, 1)); ub = np.tile(prob.ub[:m], (B, 1))
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
            t0 = time.time(); out = f(*a); np.asarray(out.y)
            ts.append(time.time() - t0)
        return med(ts)
    t1, t21 = t_ipm(1), t_ipm(21)
    slope = (t21 - t1) / 20
    print(f"B={B:4d}: 1 it {1e3*t1:6.0f} ms, 21 it {1e3*t21:6.0f} ms -> "
          f"{1e3*slope:6.2f} ms/iter  ({1e6*slope/B:7.1f} us/iter/instance)",
          flush=True)
