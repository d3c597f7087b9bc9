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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
