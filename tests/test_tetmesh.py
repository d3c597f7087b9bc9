"""Tetrahedral box mesher (mesh/tetmesh.py) — the genuinely
unstructured mesh generator behind the BENCH unstructured row
(VERDICT r4 missing #2).

Oracles: watertight geometry (per-cell closure, exact total volume),
conforming 6-tet split (every internal quad diagonal matched), tet
addressing really is unstructured (COO fraction > 0), GAMG pairwise
converges within ~2x of the structured iteration count, and a PISO
duct flow runs bounded."""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.mesh import to_device
from foamtpu.mesh.tetmesh import coo_fraction, tet_box


def test_geometry_watertight():
    pm = tet_box(8, 4, 4, size=(2.0, 1.0, 1.0))
    assert pm.n_cells == 8 * 4 * 4 * 6
    nIf = pm.neighbour.shape[0]
    acc = np.zeros((pm.n_cells, 3))
    np.add.at(acc, pm.owner, pm.sf)
    np.add.at(acc, pm.neighbour, -pm.sf[:nIf])
    assert np.abs(acc).max() < 1e-14, "cells not closed"
    assert pm.v.min() > 0
    np.testing.assert_allclose(pm.v.sum(), 2.0, rtol=1e-12)
    # every internal face shared by exactly 2 cells by construction;
    # face normals point owner -> neighbour
    d = np.einsum("fi,fi->f", pm.sf[:nIf],
                  pm.c[pm.neighbour] - pm.c[pm.owner[:nIf]])
    assert (d > 0).all()
    names = {p.name: p for p in pm.patches}
    assert names["inlet"].size == 4 * 4 * 2
    assert names["outlet"].size == 4 * 4 * 2
    assert names["walls"].type == "wall"


def test_unstructured_addressing():
    mesh = to_device(tet_box(8, 4, 4))
    frac = coo_fraction(mesh)
    assert frac > 0.1, f"tet mesh looks structured (coo={frac})"


def test_gamg_pairwise_iters_near_structured():
    """Poisson on the tet duct: GAMG (face-weight pairwise
    agglomeration where needed) converges within 2x of the structured
    count (VERDICT r4 'Done' criterion for the unstructured row)."""
    from foamtpu.bc import patchfields as pf
    from foamtpu.core.dimensions import dimTime
    from foamtpu.core.fields import vol_scalar
    from foamtpu.ops import fvm
    from foamtpu.solvers import linear
    from foamtpu.solvers.linear.gamg import GAMG, hierarchy_for_mesh

    def gamg_iters(mesh):
        bcs = tuple(
            pf.fixed_value(0.0) if p.name == "outlet"
            else pf.zero_gradient() for p in mesh.patches)
        fld = vol_scalar(mesh, 0.0, name="p", bcs=bcs)
        gam = jnp.ones(mesh.n_faces, mesh.v.dtype)
        eqn = fvm.laplacian(mesh, gam, fld, corrected=True,
                            gamma_dims=dimTime)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(mesh.n_cells) * 1e-3,
                        mesh.v.dtype)
        eqn = eqn.replace_fields(source=eqn.source + b)
        ctl = {"solver": "GAMG", "tolerance": 1e-6, "relTol": 0.0,
               "maxIter": 200,
               "_gamg": GAMG(mesh,
                             levels=hierarchy_for_mesh(mesh,
                                                       n_coarsest=64))}
        x, perf = linear.solve(mesh, eqn, fld.data, ctl)
        assert float(perf.final_residual) < 1e-6
        return int(perf.n_iterations)

    it_tet = gamg_iters(to_device(tet_box(16, 8, 8)))
    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh

    hexm = to_device(blockmesh.generate(parse_string("""
vertices (
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (16 8 8) simpleGrading (1 1 1) );
boundary (
    inlet  { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls  { type wall; faces ((3 7 6 2) (1 5 4 0) (0 3 2 1) (4 5 6 7)); }
);
""")))
    it_hex = gamg_iters(hexm)
    assert it_tet <= 2 * max(it_hex, 6), \
        f"tet GAMG degraded: {it_tet} vs hex {it_hex}"


def test_piso_duct_flow_bounded():
    from foamtpu.bc import patchfields as pf
    from foamtpu.core.dimensions import DimensionSet, dimVelocity
    from foamtpu.core.fields import vol_scalar, vol_vector
    from foamtpu.solvers import piso

    mesh = to_device(tet_box(12, 6, 6, size=(2.0, 1.0, 1.0)))
    ubcs, pbcs = [], []
    for p in mesh.patches:
        if p.name == "inlet":
            ubcs.append(pf.fixed_value(jnp.asarray([1.0, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())
        elif p.name == "outlet":
            ubcs.append(pf.zero_gradient())
            pbcs.append(pf.fixed_value(0.0))
        else:
            ubcs.append(pf.fixed_value(jnp.asarray([0.0, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.asarray([1.0, 0.0, 0.0]), name="U",
                   dims=dimVelocity, bcs=tuple(ubcs))
    p = vol_scalar(mesh, 0.0, name="p", dims=DimensionSet.of(0, 2, -2),
                   bcs=tuple(pbcs))
    cfg = piso.PisoConfig(nu=0.01, n_correctors=2, corrected=True)
    state = piso.initial_state(mesh, U, p)
    dt = jnp.asarray(0.004, mesh.v.dtype)
    diag = None
    for _ in range(10):
        state, diag = piso.piso_step(mesh, state, dt, cfg)
    u = np.asarray(state["U"].data)
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 3.0             # bounded
    assert float(diag["continuity"]) < 1e-4
    # bulk flow goes +x
    assert u[:, 0].mean() > 0.3
