"""Programmatic construction of the benchmark/tutorial cases
(reference: tutorials/ — the case dictionaries are also shipped under
tutorials/ in this repo; this module builds the same cases directly)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..bc import patchfields as pf
from ..core.dictionary import parse_string
from ..core.dimensions import DimensionSet, dimVelocity
from ..core.fields import vol_scalar, vol_vector
from ..mesh import blockmesh, to_device
from ..solvers import piso

CAVITY3D_BLOCKMESH = """
convertToMeters 0.1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) ({n} {n} {n}) simpleGrading (1 1 1) );
boundary
(
    movingWall { type wall; faces ((3 7 6 2)); }
    fixedWalls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0)
                                   (0 3 2 1) (4 5 6 7)); }
);
"""

CAVITY_BLOCKMESH = """
convertToMeters 0.1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) ({n} {n} 1) simpleGrading (1 1 1) );
boundary
(
    movingWall { type wall; faces ((3 7 6 2)); }
    fixedWalls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def make_cavity(n: int = 20, nu: float = 0.01,
                p_solver: Dict | None = None,
                three_d: bool = False) -> Tuple:
    """icoFoam cavity (reference: tutorials/incompressible/icoFoam/cavity):
    returns (device_mesh, initial_state, PisoConfig). three_d=True
    builds the n^3 lid-driven cube (the scale-demo case)."""
    src = CAVITY3D_BLOCKMESH if three_d else CAVITY_BLOCKMESH
    d = parse_string(src.replace("{n}", str(n)))
    mesh = to_device(blockmesh.generate(d))

    if p_solver and str(p_solver.get("solver")) == "GAMG" \
            and "_gamg" not in p_solver:
        from ..solvers.linear.gamg import GAMG

        p_solver = dict(p_solver)
        p_solver["_gamg"] = GAMG(mesh)

    ubcs, pbcs = [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            ubcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            pbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "movingWall":
            ubcs.append(pf.fixed_value(jnp.asarray([1.0, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())
        else:
            ubcs.append(pf.fixed_value(jnp.asarray([0.0, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())

    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(ubcs))
    p = vol_scalar(mesh, 0.0, name="p", dims=DimensionSet.of(0, 2, -2),
                   bcs=tuple(pbcs))
    cfg = piso.PisoConfig(
        nu=nu,
        n_correctors=2,
        n_non_orth=0,
        p_controls=p_solver or {
            "solver": "PCG", "preconditioner": "diagonal",
            "tolerance": 1e-6, "relTol": 0.0, "maxIter": 5000,
        },
        u_controls={"solver": "smoothSolver", "tolerance": 1e-5,
                    "relTol": 0.0, "maxIter": 500, "nSweeps": 2},
    )
    state = piso.initial_state(mesh, U, p)
    return mesh, state, cfg
