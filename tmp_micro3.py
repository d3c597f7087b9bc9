import os, sys, time, statistics, dataclasses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from foamtpu.apps.cases import make_cavity
from foamtpu.solvers import piso

N = int(os.environ.get("PROF_N", "400"))

def timeit_steps(step, state, dt, K=10, trials=3):
    s, _ = step(state, dt)
    float(jnp.sum(s["U"].data))
    ts = []
    for _ in range(trials):
        s = state
        t0 = time.perf_counter()
        for _ in range(K):
            s, _ = step(s, dt)
        float(jnp.sum(s["U"].data))
        ts.append((time.perf_counter() - t0) / K)
    return statistics.median(ts) * 1e3

def build(p_ctl=None, **cfg_over):
    mesh, state, cfg = make_cavity(N, p_solver=p_ctl or {
        "solver": "GAMG", "preconditioner": "polynomial",
        "tolerance": 1e-7, "relTol": 0.01, "maxIter": 1000})
    if cfg_over:
        cfg = cfg._replace(**cfg_over)
    dt = jnp.asarray(0.5 * (0.1 / N), mesh.v.dtype)
    step = piso.make_step(mesh, cfg)
    for _ in range(3):
        state, _ = step(state, dt)
    float(jnp.sum(state["U"].data))
    return mesh, state, cfg, dt, step

rows = []
mesh, state, cfg, dt, step = build()

rows.append(("full step (2 corr, GAMG, U solve)", timeit_steps(step, state, dt)))

try:
    _,s3,_,d3,st3 = build(p_ctl={"solver": "GAMG", "preconditioner": "polynomial",
        "tolerance": 1e-7, "relTol": 0.01, "maxIter": 1})
    rows.append(("p maxIter=1 (2 corr)", timeit_steps(st3, s3, d3)))
except Exception as e:
    print("pmax fail", e)

try:
    _,s4,_,d4,st4 = build(u_controls={"solver": "PBiCGStab", "tolerance": 1e-5,
                                      "relTol": 0.1, "maxIter": 1})
    rows.append(("U maxIter=1", timeit_steps(st4, s4, d4)))
except Exception as e:
    print("umax fail", e)

print(f"\n# variant bisect — cavity {N}x{N}")
for n, ms in rows:
    print(f"{n:40s} {ms:8.3f} ms/step")
