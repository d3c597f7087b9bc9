import os, sys, time, statistics
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from foamtpu.apps.cases import make_cavity
from foamtpu.solvers import piso

N = int(os.environ.get("PROF_N", "400"))
mesh, state, cfg = make_cavity(N, p_solver={
    "solver": "GAMG", "preconditioner": "polynomial",
    "tolerance": 1e-7, "relTol": 0.01, "maxIter": 1000})
dt = jnp.asarray(0.5 * (0.1 / N), mesh.v.dtype)
step = piso.make_step(mesh, cfg)
for _ in range(3):
    state, diag = step(state, dt)
float(jnp.sum(state["U"].data))

def timeit(fn, reps=20, trials=3):
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(out)) if hasattr(out, 'dtype') else None
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        float(jnp.sum(out))
        ts.append((time.perf_counter() - t0) / reps)
    return statistics.median(ts) * 1e3

# 1. dispatch floor: trivial noop
x0 = jnp.zeros(16, jnp.float32)
noop = jax.jit(lambda x: x + 1.0)
print(f"noop jit call:        {timeit(lambda: noop(x0)):8.3f} ms")

# 2. single step (dispatch included)
print(f"single step:          {timeit(lambda: step(state, dt)[0]['U'].data):8.3f} ms")

# 3. K steps inside one python loop (async pipelining?)
K = 10
def ksteps():
    s = state
    for _ in range(K):
        s, _ = step(s, dt)
    return s["U"].data
print(f"{K} steps looped /step: {timeit(lambda: ksteps(), reps=2)/K:8.3f} ms")
