import os, sys, time, glob, gzip, json, collections
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
for _ in range(3):
    state, _ = step(state, dt)
float(jnp.sum(state["U"].data))

outdir = "/tmp/jaxtrace"
os.system(f"rm -rf {outdir}")
jax.profiler.start_trace(outdir)
for _ in range(3):
    state, _ = step(state, dt)
float(jnp.sum(state["U"].data))
jax.profiler.stop_trace()

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
if files:
    ev = json.load(gzip.open(files[0]))["traceEvents"]
    dur = collections.Counter()
    tot = 0.0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            # keep only device lanes (skip python/host)
            dur[name] += e["dur"]
    for name, d in dur.most_common(40):
        print(f"{d/1e3:9.3f} ms  {name[:100]}")
else:
    print(glob.glob(outdir + "/**/*", recursive=True)[:20])
