"""Split real-solve wall into chunk-call wall vs host rest."""
import time
import numpy as np
import jax, jax.numpy as jnp
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
dense = densify(prob)
data = build_ipm_data(dense)
m = dense.nvars
settings = resolve_backend_autos(Settings(bb=BBSettings(batch_size=B)))
root_lb = np.asarray(prob.lb[:m]); root_ub = np.asarray(prob.ub[:m])

# warm
solve_misdp(prob, Settings(bb=BBSettings(batch_size=B, node_limit=2*B)))
T.solve_turbo(dense, prob, settings, root_lb, root_ub, np.inf, None,
              data=data, rounds_per_dispatch=settings.bb.turbo_rounds)

# shim chunk to time each dispatch + the summary fetch separately
orig_chunk_for = T._chunk_for
events = []
def shim_chunk_for(*a, **kw):
    chunk = orig_chunk_for(*a, **kw)
    def timed(data, st, key, nl, k):
        t0 = time.time()
        st2, summary = chunk(data, st, key, nl, k=k)
        t1 = time.time()
        s = np.asarray(summary)   # the fetch
        t2 = time.time()
        events.append(("chunk_call", t1-t0))
        events.append(("summary_fetch", t2-t1))
        class _S:  # already-fetched wrapper so np.asarray in caller is free
            def __array__(self, *aa, **kk): return s
        return st2, _S()
    return timed
T._chunk_for = shim_chunk_for

t0 = time.time()
res = T.solve_turbo(dense, prob, settings, root_lb, root_ub, np.inf, None,
                    data=data, rounds_per_dispatch=settings.bb.turbo_rounds)
total = time.time() - t0
T._chunk_for = orig_chunk_for
print(f"total {total*1e3:.0f} ms, nodes={res.nodes} rounds={res.rounds}")
print(f"counters: nsolves={res.nsolves} iters={res.iters} nheur={res.nheur} "
      f"ndirect={res.ndirect} nunsolved={res.nunsolved}")
