"""Solver applications: case-driven host loops
(the equivalents of the reference's applications/solvers/ binaries).

Each application reads its config from the case dictionaries, builds
the jitted step, runs the Time loop with reference-format logging, and
writes OpenFOAM-format output at write times.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import case as case_mod
from ..core.dictionary import dimensioned_scalar
from ..utils import logging as log
from . import piso as piso_mod


def _piso_cfg_from_case(case, nu: float, turbulence=None,
                        control_name: str = "PISO") -> piso_mod.PisoConfig:
    pdict = case.pimple_controls(control_name)
    return piso_mod.PisoConfig(
        nu=nu,
        n_correctors=int(pdict.get("nCorrectors", 2)),
        n_non_orth=int(pdict.get("nNonOrthogonalCorrectors", 0)),
        momentum_predictor=str(pdict.get("momentumPredictor", "yes")) in (
            "yes", "true", "on", "1"),
        corrected=case.laplacian_corrected(),
        div_scheme=case.div_scheme("div(phi,U)"),
        p_ref_cell=int(pdict.get("pRefCell", 0)),
        p_ref_value=float(pdict.get("pRefValue", 0.0)),
        p_controls=case.solver_controls("p"),
        u_controls=case.solver_controls("U"),
        turbulence=turbulence,
    )


def icofoam(case, max_steps: Optional[int] = None) -> None:
    """icoFoam: transient laminar incompressible PISO
    (reference: applications/solvers/incompressible/icoFoam/icoFoam.C)."""
    mesh = case.mesh
    tp = case.transport_properties()
    _, nu = dimensioned_scalar(tp["nu"])

    U = case.read_field("U")
    p = case.read_field("p")
    cfg = _piso_cfg_from_case(case, nu)
    step = piso_mod.make_step(mesh, cfg)
    state = piso_mod.initial_state(mesh, U, p)

    log.info(f"Starting time loop: icoFoam, {mesh.n_cells} cells\n")
    cumulative = 0.0
    for t in case.time.loop():
        dt = jnp.asarray(t.current_dt, mesh.v.dtype)
        state, diag = step(state, dt)
        log.info(f"Time = {t.name}\n")
        log.info(log.courant_line(float(diag["courant_mean"]),
                                  float(diag["courant_max"])))
        if diag.get("Ux") is not None:
            log.info(log.solver_line("U", diag["Ux"]))
        from ..solvers.linear.krylov import SolverPerf

        log.info(log.solver_line("p", SolverPerf(
            diag["p_initial"], diag["p_final"], diag["p_iters"])))
        local = float(diag["continuity"]) * t.current_dt
        glob = float(diag.get("continuity_global", 0.0)) * t.current_dt
        cumulative += glob
        log.info(log.continuity_line(local, glob, cumulative))
        log.info(f"ExecutionTime = {t.execution_time():.2f} s"
                 f"  ClockTime = {t.clock_time():.0f} s\n")
        if t.write_time():
            case.write_fields([state["U"], state["p"]])
            log.info(f"Writing fields at time {t.name}\n")
        if max_steps is not None and t.index >= max_steps:
            break
    case.write_fields([state["U"], state["p"]])
    log.info("End\n")
    case.final_state = state


case_mod.register_application("icoFoam", icofoam)
