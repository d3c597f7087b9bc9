import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from foamtpu.apps.cases import make_cavity
from foamtpu.solvers import piso

N = 400
mesh, state, cfg = make_cavity(N, p_solver={
    "solver": "GAMG", "preconditioner": "polynomial",
    "tolerance": 1e-7, "relTol": 0.01, "maxIter": 1000})
dt = jnp.asarray(0.5 * (0.1 / N), mesh.v.dtype)
step = piso.make_step(mesh, cfg)
state, _ = step(state, dt)  # trigger compile through the wrapper

# reach the cached compiled object if possible; else lower explicitly
from foamtpu.solvers import jitstep
import inspect
print([n for n in dir(jitstep) if not n.startswith('_')])

# explicit lower+compile of one step
f = jax.jit(lambda s, d: piso.piso_step(mesh, s, d, cfg))
lowered = f.lower(state, dt)
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
keys = sorted(ca.keys())
for k in keys:
    if "bytes" in k or "flops" in k or "optimal" in k.lower():
        print(f"{k}: {ca[k]:.3e}")
ba = ca.get("bytes accessed", 0.0)
print(f"\nbytes accessed total: {ba/1e9:.3f} GB -> "
      f"{ba/820e9*1e3:.2f} ms at 820 GB/s")
print(f"flops: {ca.get('flops',0)/1e9:.2f} GF -> "
      f"{ca.get('flops',0)/2e13*1e3:.3f} ms at 20 TF/s (vpu f32)")
