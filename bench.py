"""Benchmark: icoFoam cavity PISO throughput on one chip.

Prints ONE JSON line:
  {"metric": "cells_per_sec_per_chip", "value": N, "unit": "cell-updates/s",
   "vs_baseline": N}

Baseline denominator: the reference publishes no numbers (BASELINE.md);
the pinned estimate for icoFoam on an 8-core 2013-era CPU for a
400x400 cavity step (2 PISO correctors, PCG pressure solves to 1e-6)
is ~1.0e6 cell-updates/s. vs_baseline = value / 1.0e6, so the >=20x
target reads as vs_baseline >= 20.

Artifact-proofing (BENCH_r02 captured a 400x-wrong 798x number because
block_until_ready through the axon tunnel returned without waiting,
while the residual fetch that actually synced happened after t1):
- every timed region ends with a forced device->host scalar transfer
  (float(jnp.sum(...))) which cannot complete before the enqueued work;
- report the MEDIAN over >=3 trials;
- reject timings faster than a physical floor derived from the HBM
  bandwidth of the chip (a PISO step must at minimum stream the
  pressure-matrix arrays p_iters times).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache (same dir as tests/conftest.py):
# the dominant cost of a cold bench run is compiling the step/chunk
# programs (~5-7 min total through the tunneled chip, VERDICT r4
# weak #1 — BENCH_r04 timed out before printing anything). With the
# cache warm the whole script finishes in ~2 min. Must be set before
# jax initialises (jax imports are deferred into main()).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/foamtpu-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

_T_START = time.perf_counter()
# Wall-clock budget: optional sub-benches are skipped once elapsed time
# crosses this, so the headline JSON always lands inside the driver's
# timeout even on a cold compilation cache.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))


def _over_budget():
    return time.perf_counter() - _T_START > BUDGET_S


def _emit(out):
    """Print the current result JSON and flush — called progressively
    (after the cavity rows, then again after each optional sub-bench)
    so a driver timeout mid-run still leaves a complete parsed line on
    stdout (the driver takes the last valid JSON line)."""
    print(json.dumps(out), flush=True)


BASELINE_CELLS_PER_SEC = 1.0e6


def _measured_cpu_baseline():
    """Measured scipy-icoFoam denominator (tools/cpu_baseline.py,
    recorded in tools/cpu_baseline.json). The 8-core linear-scaling
    bound measured 0.90e6 (loose) / 0.15e6 (tight) cell-updates/s —
    both BELOW the pinned 1.0e6 estimate, so vs_baseline keeps the
    pinned (larger, i.e. more conservative) denominator and the
    measured rows ride along in detail."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "cpu_baseline.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None
N = int(os.environ.get("BENCH_N", "400"))
NSTEPS = int(os.environ.get("BENCH_STEPS", "10"))
NTRIALS = int(os.environ.get("BENCH_TRIALS", "3"))
# v5e HBM ~820 GB/s; use 2 TB/s as a generous "impossible beyond this"
# ceiling so the floor only rejects fantasy numbers, never real ones.
HBM_CEIL_BYTES_PER_SEC = 2.0e12


def _sync_scalar(x):
    """Force a real device->host transfer (the honest fence)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def timed_steps(step, state, dt, nsteps, sync_field="U"):
    """One timed trial of `nsteps` solver steps, fenced by a host fetch."""
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state, diag = step(state, dt)
    _ = _sync_scalar(state[sync_field].data)
    t1 = time.perf_counter()
    return t1 - t0, state, diag


def median_trials(step, state, dt, nsteps, ntrials, sync_field="U"):
    times = []
    diag = None
    for _ in range(ntrials):
        sec, state, diag = timed_steps(step, state, dt, nsteps, sync_field)
        times.append(sec / nsteps)
    return statistics.median(times), times, state, diag


def median_chunk_trials(chunk, state, dt, nsteps, ntrials, sync_field="U"):
    """Timed trials where ONE device call advances `nsteps` steps
    (piso.make_chunk) — amortises the per-program dispatch cost
    (~8-12 ms through the tunneled chip, measured r4), exactly how a
    production run drives the solver."""
    times = []
    diag = None
    for _ in range(ntrials):
        t0 = time.perf_counter()
        state, diag = chunk(state, dt)
        _ = _sync_scalar(state[sync_field].data)
        times.append((time.perf_counter() - t0) / nsteps)
    return statistics.median(times), times, state, diag


def plausibility_floor(n_cells, p_iters):
    """Minimum credible sec/step: each pressure iteration must stream at
    least ~5 f32 arrays of n_cells (diag, x, b, r, p) through HBM."""
    bytes_per_step = max(int(p_iters), 1) * n_cells * 5 * 4
    return bytes_per_step / HBM_CEIL_BYTES_PER_SEC


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

    chunk = piso.make_chunk(mesh, cfg, NSTEPS)

    # warmup/compile + settle
    state, diag = chunk(state, dt)
    _ = _sync_scalar(state["U"].data)

    sec_per_step, trial_times, state, diag = median_chunk_trials(
        chunk, state, dt, NSTEPS, NTRIALS)

    p_iters = int(diag["p_iters"])
    floor = plausibility_floor(n_cells, p_iters)
    implausible = sec_per_step < floor
    if implausible:
        # fall back to fully synchronous per-step timing — slower but
        # impossible to fake
        step = piso.make_step(mesh, cfg)
        t0 = time.perf_counter()
        for _ in range(NSTEPS):
            state, diag = step(state, dt)
            _ = _sync_scalar(state["U"].data)
        sec_per_step = (time.perf_counter() - t0) / NSTEPS

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
            "trial_sec_per_step": [round(t, 5) for t in trial_times],
            "plausibility_floor_sec": round(floor, 6),
            "resynced_after_implausible": implausible,
            "p_iters_last": p_iters,
            "p_final_residual": float(diag["p_final"]),
            "continuity": float(diag["continuity"]),
            "device": str(jax.devices()[0]),
        },
    }
    cpu = _measured_cpu_baseline()
    if cpu:
        out["detail"]["cpu_baseline_measured"] = {
            "loose_8core_linear": cpu["loose"]["cells_per_sec_8core_linear"],
            "tight_8core_linear": cpu["tight"]["cells_per_sec_8core_linear"],
            "pinned_denominator": BASELINE_CELLS_PER_SEC,
            "note": "pinned 1.0e6 > both measured rows; kept as the "
                    "conservative denominator (see tools/cpu_baseline.py)",
        }
    # headline is on stdout from here on — every later failure or
    # timeout degrades the detail, never the parsed metric
    _emit(out)

    sub_benches = [("tight_tol", bench_tight), ("ensemble", bench_ensemble),
                   ("pitzDaily", bench_pitz),
                   ("unstructured", bench_unstructured)]
    if os.environ.get("BENCH_SCALE") == "1":
        sub_benches.append(("scale3d", bench_scale3d))
    for key, fn in sub_benches:
        if _over_budget():
            out["detail"][key] = {
                "skipped": f"over BENCH_BUDGET_S={BUDGET_S:.0f}s "
                           f"at {time.perf_counter() - _T_START:.0f}s"}
            continue
        try:
            out["detail"][key] = fn()
        except Exception as e:
            out["detail"][key] = {"error": f"{type(e).__name__}: {e}"}
        out["detail"]["elapsed_s"] = round(time.perf_counter() - _T_START, 1)
        _emit(out)
    errored = [k for k, v in out["detail"].items()
               if isinstance(v, dict) and "error" in v]
    if errored:
        print(f"bench.py: sub-bench(es) ERRORED: {errored}", file=sys.stderr)
    out["detail"]["elapsed_s"] = round(time.perf_counter() - _T_START, 1)
    _emit(out)


def bench_tight():
    """Reference-tutorial-grade tolerances (p tol 1e-6, no relTol
    shortcut) on the same cavity — the honest comparison row the loose
    headline must be read against (VERDICT r2 weak #7)."""
    import jax.numpy as jnp

    from foamtpu.apps.cases import make_cavity
    from foamtpu.solvers import piso

    mesh, state, cfg = make_cavity(N, p_solver={
        "solver": "GAMG", "preconditioner": "polynomial",
        "tolerance": 1e-6, "relTol": 0.0, "maxIter": 1000,
    })
    dt = jnp.asarray(0.5 * (0.1 / N), mesh.v.dtype)
    nsteps = max(NSTEPS // 2, 3)
    chunk = piso.make_chunk(mesh, cfg, nsteps)
    state, diag = chunk(state, dt)
    _ = _sync_scalar(state["U"].data)
    sec, _, state, diag = median_chunk_trials(chunk, state, dt, nsteps, 3)
    return {"sec_per_step": round(sec, 5),
            "cells_per_sec": round(mesh.n_cells / sec, 1),
            "vs_baseline": round(mesh.n_cells / sec / BASELINE_CELLS_PER_SEC,
                                 3),
            "p_iters_last": int(diag["p_iters"]),
            "p_final_residual": float(diag["p_final"]),
            "continuity": float(diag["continuity"])}


def bench_scale3d():
    """Scale demo (SCALE.md): n^3 lid-driven cavity, PISO+GAMG on one
    chip. BENCH_SCALE=1 enables (build+compile is minutes at n=100)."""
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
    _ = _sync_scalar(state["U"].data)
    sec, _, state, diag = median_trials(step, state, dt, 10, 3)
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

    import numpy as np

    repo = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(repo, "tutorials", "incompressible", "simpleFoam",
                       "pitzDaily")
    dst = os.path.join(tempfile.mkdtemp(prefix="bench_pitz"), "pitzDaily")
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main as cli_main

    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        # keep stdout JSON-only: the driver parses the last JSON line
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
    _ = _sync_scalar(state["U"].data)
    secs = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, diag = chunk(state)
        _ = _sync_scalar(state["U"].data)
        secs.append((time.perf_counter() - t0) / niter)
    sec_per_iter = statistics.median(secs)

    # isolated GAMG pressure solve (the reference's hottest kernel):
    # assemble the pEqn once, time repeated jitted solves
    import jax

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
    _ = _sync_scalar(x)
    reps = 20
    solve_ms = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            x, perf = solve_p(b, x)
        _ = _sync_scalar(x)
        solve_ms.append((time.perf_counter() - t0) / reps * 1e3)
    return {
        "n_cells": mesh.n_cells,
        "simple_sec_per_iter": round(sec_per_iter, 5),
        "simple_cells_per_sec": round(mesh.n_cells / sec_per_iter, 1),
        "simple_trials": [round(s, 5) for s in secs],
        "gamg_p_solve_ms": round(statistics.median(solve_ms), 3),
        "gamg_p_iters": int(perf.n_iterations),
        "p_initial_residual": float(np.asarray(diag["p_initial"])),
    }




def bench_unstructured():
    """Genuinely unstructured at scale (VERDICT r4 missing #2): a
    ~590k-cell tetrahedral duct (6-tet split, mesh/tetmesh.py — tet
    addressing defeats the structured offset stencil: the COO-fallback
    fraction is reported), simpleFoam + kOmegaSST wall functions, GAMG
    pressure solve with face-weight pairwise agglomeration. Row
    reports SIMPLE sec/iter, cells/s, GAMG iters and the COO fraction.
    Sized by BENCH_UNSTRUCT (e.g. '96x32x32'; 'off' disables)."""
    spec = os.environ.get("BENCH_UNSTRUCT", "96x32x32")
    if spec in ("0", "off"):
        return {"skipped": "BENCH_UNSTRUCT=off"}
    nx, ny, nz = (int(t) for t in spec.split("x"))

    import numpy as np

    import jax
    import jax.numpy as jnp

    from foamtpu.bc import patchfields as pf
    from foamtpu.core.dictionary import FoamDict, Word
    from foamtpu.core.dimensions import DimensionSet, dimVelocity, \
        dimViscosity
    from foamtpu.core.fields import vol_scalar, vol_vector
    from foamtpu.mesh import to_device
    from foamtpu.mesh.tetmesh import coo_fraction, tet_box
    from foamtpu.models.turbulence import select as turb_select
    from foamtpu.solvers import piso, simple
    from foamtpu.solvers.linear.gamg import GAMG

    t0 = time.perf_counter()
    pm = tet_box(nx, ny, nz, size=(4.0, 1.0, 1.0))
    mesh = to_device(pm)
    build_s = time.perf_counter() - t0

    NU = 1e-5
    k0 = 1.5 * (1.0 * 0.05) ** 2
    w0 = k0 ** 0.5 / (0.09 ** 0.25 * 0.1)

    def bcs_for(inlet_val, wall_kind):
        out = []
        for p in mesh.patches:
            v = jnp.asarray(inlet_val)
            shape = (p.size,) if v.ndim == 0 else (p.size, 3)

            def pface(val):
                return jnp.broadcast_to(jnp.asarray(val), shape)

            if p.name == "inlet":
                out.append(pf.fixed_value(pface(inlet_val)))
            elif p.name == "outlet":
                out.append(pf.make("inletOutlet",
                                   ref_value=pface(0.0 * v)))
            elif wall_kind == "fixedValue":
                out.append(pf.fixed_value(pface(0.0 * v)))
            else:
                out.append(pf.make(wall_kind, ref_value=pface(0.0 * v)))
        return tuple(out)

    U = vol_vector(mesh, jnp.asarray([1.0, 0.0, 0.0]), name="U",
                   dims=dimVelocity,
                   bcs=bcs_for(jnp.asarray([1.0, 0.0, 0.0]),
                               "fixedValue"))
    pbcs = tuple(
        pf.fixed_value(0.0) if p.name == "outlet" else pf.zero_gradient()
        for p in mesh.patches)
    p_f = vol_scalar(mesh, 0.0, name="p", dims=DimensionSet.of(0, 2, -2),
                     bcs=pbcs)
    k = vol_scalar(mesh, k0, name="k", dims=DimensionSet.of(0, 2, -2),
                   bcs=bcs_for(jnp.asarray(k0), "kqRWallFunction"))
    om = vol_scalar(mesh, w0, name="omega",
                    dims=DimensionSet.of(0, 0, -1),
                    bcs=bcs_for(jnp.asarray(w0), "omegaWallFunction"))
    nut = vol_scalar(mesh, 0.0, name="nut", dims=dimViscosity,
                     bcs=bcs_for(jnp.asarray(0.0), "nutkWallFunction"))

    props = FoamDict()
    props[Word("RASModel")] = Word("kOmegaSST")
    props[Word("turbulence")] = Word("on")
    model = turb_select(props, NU)
    if hasattr(model, "init_wall_distance"):
        model.init_wall_distance(pm, np.asarray(mesh.v).dtype)

    t0 = time.perf_counter()
    gamg = GAMG(mesh)
    prep_s = time.perf_counter() - t0

    cfg = simple.SimpleConfig(
        nu=NU, alpha_u=0.7, alpha_p=0.3,
        p_controls={"solver": "GAMG", "preconditioner": "polynomial",
                    "tolerance": 1e-7, "relTol": 0.01, "maxIter": 500,
                    "_gamg": gamg},
        u_controls={"solver": "smoothSolver", "tolerance": 1e-5,
                    "relTol": 0.1, "maxIter": 300, "nSweeps": 2},
        turb=model, turb_relax=0.7)
    state = piso.initial_state(mesh, U, p_f,
                               turb_state={"k": k, "omega": om,
                                           "nut": nut})
    niter = int(os.environ.get("BENCH_UNSTRUCT_ITERS", "5"))
    chunk = simple.make_chunk(mesh, cfg, niter)
    state, diag = chunk(state)
    _ = _sync_scalar(state["U"].data)
    t0 = time.perf_counter()
    state, diag = chunk(state)
    _ = _sync_scalar(state["U"].data)
    sec = (time.perf_counter() - t0) / niter
    return {"case": f"simpleFoam kOmegaSST tet duct {nx}x{ny}x{nz}x6",
            "n_cells": mesh.n_cells,
            "coo_fraction": round(coo_fraction(mesh), 4),
            "mesh_build_s": round(build_s, 1),
            "gamg_setup_s": round(prep_s, 1),
            "sec_per_iter": round(sec, 4),
            "cells_per_sec": round(mesh.n_cells / sec, 1),
            "gamg_p_iters": int(diag["p_iters"]) if "p_iters" in diag
            else None,
            "p_initial": float(np.asarray(diag.get("p_initial", -1.0))),
            "continuity": float(np.asarray(diag.get("continuity", -1.0)))}


def bench_ensemble():
    """Ensemble (vmapped-case) throughput: 8 cavity replicas with
    different lid speeds advance in ONE batched PISO step — the
    TPU-native parameter-sweep mode (parallel/ensemble.py). Reported
    as aggregate cell-updates/s vs the single-case rate on the same
    mesh."""
    import jax.numpy as jnp

    from foamtpu.apps.cases import make_cavity
    from foamtpu.parallel import ensemble
    from foamtpu.solvers import piso

    n = int(os.environ.get("BENCH_ENS_N", "128"))
    nmem = int(os.environ.get("BENCH_ENS_M", "8"))
    mesh, state, cfg = make_cavity(n)
    dt = jnp.asarray(0.5 * (0.1 / n), mesh.v.dtype)

    step1 = piso.make_step(mesh, cfg)
    s1, diag = step1(state, dt)
    _ = _sync_scalar(s1["U"].data)
    sec1, _, s1, diag = median_trials(step1, s1, dt, 10, 3)

    import jax

    states = ensemble.stack([state] * nmem)
    # vary the lid speed per lane so the lanes genuinely differ
    scale = jnp.linspace(0.5, 2.0, nmem)
    U = states["U"]
    bcs = list(U.bcs)
    for i, (p_, bc) in enumerate(zip(mesh.patches, bcs)):
        if p_.name in ("movingWall", "lid"):
            rv = jnp.asarray(bc.ref_value)
            rv = rv * scale[:, None, None] if rv.ndim == 3 else \
                rv * scale[:, None]
            bcs[i] = bc.replace(ref_value=rv)
    states["U"] = U.replace(bcs=tuple(bcs))
    estep = ensemble.make_step(mesh, piso.piso_step, cfg,
                               (cfg.p_controls, cfg.u_controls))
    states, diags = estep(states, dt)
    _ = _sync_scalar(states["U"].data)
    secN, _, states, diags = median_trials(estep, states, dt, 10, 3)

    return {"case": f"icoFoam cavity {n}x{n} ensemble x{nmem}",
            "n_cells": mesh.n_cells, "members": nmem,
            "single_sec_per_step": round(sec1, 5),
            "ensemble_sec_per_step": round(secN, 5),
            "aggregate_cells_per_sec":
                round(nmem * mesh.n_cells / secN, 1),
            "speedup_vs_serial_sweep": round(nmem * sec1 / secN, 2)}

if __name__ == "__main__":
    main()
