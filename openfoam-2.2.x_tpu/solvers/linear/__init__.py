"""Linear solver dispatch from fvSolution controls
(reference: fvMatrix::solve -> lduMatrix::solver::New,
src/finiteVolume/fvMatrices/fvMatrix/fvMatrixSolve.C).

Vector equations solve segregated, component by component, exactly as
the reference does.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from . import krylov
from .krylov import SolverPerf

_SOLVERS = {
    "PCG": krylov.pcg,
    "PBiCG": krylov.bicgstab,
    "PBiCGStab": krylov.bicgstab,
    "smoothSolver": krylov.smooth_solver,
    "diagonal": krylov.diagonal_solver,
}


def register_solver(name, fn):
    _SOLVERS[name] = fn


def solve(mesh, mat, psi: Any, controls: Dict) -> Tuple[Any, SolverPerf]:
    """Solve mat*psi = source for the field data psi [nC,(3)];
    returns (new_psi, perf-of-first-component)."""
    name = str(controls.get("solver", "PCG"))
    if name == "GAMG":
        from .gamg import solve_gamg

        return solve_gamg(mesh, mat, psi, controls)
    fn = _SOLVERS[name]
    kw = dict(
        tol=float(controls.get("tolerance", 1e-6)),
        rel_tol=float(controls.get("relTol", 0.0)),
        max_iter=int(controls.get("maxIter", 1000)),
    )
    if name in ("PCG", "PBiCG", "PBiCGStab"):
        kw["precond"] = str(controls.get("preconditioner", "diagonal"))
    if name == "smoothSolver":
        kw["n_sweeps"] = int(controls.get("nSweeps", 1))

    off = mat.off_coeffs(mesh)  # [nC,K], shared across components

    def make_amul(diag_eff):
        def amul(x):
            return diag_eff * x + jnp.sum(off * x[mesh.cnbr], axis=1)

        return amul

    def amul_off(x):
        return jnp.sum(off * x[mesh.cnbr], axis=1)

    if psi.ndim == 1:
        d = mat.diag_eff(mesh)
        b = mat.source_eff(mesh)
        amul = make_amul(d)
        row_sum = d + jnp.sum(off, axis=1)
        new_psi, perf = fn(amul, psi, b, d, row_sum=row_sum,
                           amul_off=amul_off, **kw)
        return new_psi, perf

    # segregated vector solve
    cols = []
    perf0 = None
    for c in range(psi.shape[1]):
        d = mat.diag_eff(mesh, c)
        b = mat.source_eff(mesh, c)
        amul = make_amul(d)
        row_sum = d + jnp.sum(off, axis=1)
        col, perf = fn(amul, psi[:, c], b, d, row_sum=row_sum,
                       amul_off=amul_off, **kw)
        cols.append(col)
        if perf0 is None:
            perf0 = perf
    return jnp.stack(cols, axis=1), perf0
