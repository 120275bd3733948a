"""Compile ipm_solve variants, dump XLA cost analysis + HLO op census.
Attribution basis: what the compiler actually emits per iteration."""
import dataclasses, re, sys
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
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
base = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B))).ipm

def census(name, s, n_iters=1):
    pin = dataclasses.replace(s, gaptol=1e-30, feastol=1e-30,
                              stall_window=10**6, max_iters=n_iters)
    lb = np.tile(prob.lb[:m], (B, 1)); ub = np.tile(prob.ub[:m], (B, 1))
    lbx = jnp.asarray(np.concatenate([lb, np.zeros((B, 1))], axis=1))
    ubx = jnp.asarray(np.concatenate([ub, np.zeros((B, 1))], axis=1))
    bb = jnp.asarray(np.tile(np.concatenate([dense.obj, [0.0]]), (B, 1)))
    f = jax.jit(lambda b, l, u: ipm_solve(data, b, l, u, settings=pin))
    comp = f.lower(bb, lbx, ubx).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    flops = ca.get("flops", 0.0)
    txt = comp.as_text()
    ops = {}
    for ln in txt.splitlines():
        mm = re.match(r'\s*(?:ROOT )?[%\w.\-]+ = (\w+)\(', ln.strip())
        if mm: ops[mm.group(1)] = ops.get(mm.group(1), 0) + 1
    nfus = ops.get("fusion", 0); nwhile = ops.get("while", 0)
    f64ops = len(re.findall(r'= f64\[', txt))
    print(f"{name}: iters={n_iters} flops={flops/1e9:.3f} GF "
          f"bytes={ca.get('bytes accessed', 0)/1e9:.3f} GB "
          f"fusions={nfus} whiles={nwhile} f64defs={f64ops}", flush=True)
    return flops

f1 = census("base  ", base, 1)
f21 = census("base  ", base, 21)
print(f"  -> per-iter flops {(f21-f1)/20/1e9:.3f} GF; at 55.4 ms/iter = "
      f"{(f21-f1)/20/55.4e-3/1e12:.3f} TFLOP/s achieved", flush=True)
p1 = census("power ", dataclasses.replace(base, step_rule="power"), 1)
p21 = census("power ", dataclasses.replace(base, step_rule="power"), 21)
print(f"  -> per-iter flops {(p21-p1)/20/1e9:.3f} GF; at 21.2 ms/iter = "
      f"{(p21-p1)/20/21.2e-3/1e12:.3f} TFLOP/s achieved", flush=True)
