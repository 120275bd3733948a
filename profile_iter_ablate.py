"""Ablate the per-iteration cost across settings dimensions at CLS B=128."""
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
B = 128
def med(ts): return float(np.median(ts))
base = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B))).ipm
print(f"resolved base: phase32={base.phase32} step={base.step_rule} "
      f"df32={base.use_df32} fused={base.fused_direction} "
      f"gondzio={base.gondzio} schur_refine={getattr(base,'schur_refine','?')}",
      flush=True)

def boxes(jit_i):
    lb = np.tile(prob.lb[:m], (B, 1)); ub = np.tile(prob.ub[:m], (B, 1))
    ub[:, jit_i % m] -= 1e-9 * (jit_i + 1)
    lbx = np.concatenate([lb, np.zeros((B, 1))], axis=1)
    ubx = np.concatenate([ub, np.zeros((B, 1))], axis=1)
    b = np.tile(np.concatenate([dense.obj, [0.0]]), (B, 1))
    return jnp.asarray(b), jnp.asarray(lbx), jnp.asarray(ubx)

def slope(s, reps=3):
    pin = dataclasses.replace(s, gaptol=1e-30, feastol=1e-30,
                              stall_window=10**6)
    ts = {}
    for n_it in (1, 21):
        sp = dataclasses.replace(pin, max_iters=n_it)
        f = jax.jit(lambda b, lb, ub: ipm_solve(data, b, lb, ub, settings=sp))
        f(*boxes(800 + n_it))
        tl = []
        for i in range(reps):
            a = boxes(i + 13 * n_it)
            t0 = time.time(); out = f(*a); np.asarray(out.y)
            tl.append(time.time() - t0)
        ts[n_it] = med(tl)
    return (ts[21] - ts[1]) / 20

cases = [
    ("base (resolved auto)", base),
    ("df32 off", dataclasses.replace(base, use_df32=False)),
    ("fused off", dataclasses.replace(base, fused_direction=False)),
    ("gondzio 0", dataclasses.replace(base, gondzio=0)),
    ("step eigh-gersh", dataclasses.replace(base, step_rule="power")),
    ("phase32 off (pure f64)", dataclasses.replace(base, phase32="off")),
    ("dtype f32 end-to-end", dataclasses.replace(base, dtype="float32", phase32="off")),
    ("schur_refine 0", dataclasses.replace(base, schur_refine=0) if hasattr(base, 'schur_refine') else base),
]
for name, s in cases:
    try:
        sl = slope(s)
        print(f"{name:26s}: {1e3*sl:7.2f} ms/iter ({1e6*sl/B:7.1f} us/inst)", flush=True)
    except Exception as e:
        print(f"{name:26s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
