"""Refine-tier IPM per-iteration cost breakdown on the live backend.

Differencing dispatches with different iteration budgets (gaptol pinned
to 0) for the refine tier and ablations that remove one cost center
each — Schur refinement passes, the power-rule probes, the df32 exact
contractions — to locate where the per-iteration milliseconds live
before fusing kernels.  Relay gotchas respected: vary inputs between
timed calls, force fetches, one TPU job at a time.
"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

import scipsdp_tpu
if jax.default_backend() != "cpu":
    scipsdp_tpu.enable_compilation_cache()
from scipsdp_tpu.models.io import read_problem
from scipsdp_tpu.models.problem import densify
from scipsdp_tpu.ops.ipm import build_ipm_data, ipm_solve
from scipsdp_tpu.utils.config import IPMSettings

B = 8
prob = read_problem("/root/reference/instances/example_CLS.dat-s.gz")
dense = densify(prob)
data = build_ipm_data(dense)
m = dense.nvars
print(f"CLS: m={m}, blocks={dense.blocksizes}", flush=True)

root_lb = np.asarray(prob.lb[:m], dtype=np.float64)
root_ub = np.asarray(prob.ub[:m], dtype=np.float64)


def boxes(jit_i):
    lb = np.tile(root_lb, (B, 1))
    ub = np.tile(root_ub, (B, 1))
    k = jit_i % m
    ub[:, k] = np.minimum(ub[:, k], 1.0 - 1e-9 * (jit_i + 1))
    lbx = np.concatenate([lb, np.zeros((B, 1))], axis=1)
    ubx = np.concatenate([ub, np.zeros((B, 1))], axis=1)
    b = np.tile(np.concatenate([dense.obj, [0.0]]), (B, 1))
    return jnp.asarray(b), jnp.asarray(lbx), jnp.asarray(ubx)


def timed(fn, *args):
    t0 = time.time()
    out = fn(*args)
    np.asarray(out.y)
    return time.time() - t0, int(np.asarray(out.iters))


def measure(name, s, k_small=10, k_large=30, reps=3):
    f_s = jax.jit(lambda b, lb, ub: ipm_solve(
        data, b, lb, ub, settings=dataclasses.replace(s, max_iters=k_small)))
    f_l = jax.jit(lambda b, lb, ub: ipm_solve(
        data, b, lb, ub, settings=dataclasses.replace(s, max_iters=k_large)))
    timed(f_s, *boxes(1000))
    timed(f_l, *boxes(2000))
    ts, tl = [], []
    for i in range(reps):
        ts.append(timed(f_s, *boxes(i))[0])
        tl.append(timed(f_l, *boxes(100 + i))[0])
    per = (np.median(tl) - np.median(ts)) / (k_large - k_small)
    print(f"{name}: {per*1e3:.2f} ms/iter "
          f"(small {np.median(ts)*1e3:.0f} ms, large "
          f"{np.median(tl)*1e3:.0f} ms)", flush=True)
    return per


base = IPMSettings(gaptol=1e-30, feastol=1e-30, phase32="refine",
                   refine_switch=0.0, step_rule="power")
measure("refine (TPU default)", base)
measure("refine, schur_refine=0",
        dataclasses.replace(base, schur_refine=0))
measure("refine, gershgorin steps (no power, no probes)",
        dataclasses.replace(base, step_rule="gershgorin"))
measure("refine, df32 off (emulated-f64 contractions)",
        dataclasses.replace(base, use_df32="off"))
measure("plain f32 (phase32 on, switch~0)",
        dataclasses.replace(base, phase32="on", phase32_switch=1e-30))
measure("refine, probe-ladder steps",
        dataclasses.replace(base, step_rule="probe"))
