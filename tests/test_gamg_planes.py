"""Plane (slot-form) Galerkin coarsening — the gather-free GAMG path.

The structured agglomeration levels coarsen the matrix by reshape+add
over the [nC, M] slot coefficient planes (solvers/linear/gamg.py::
_coarsen_planes) instead of gathering through face tables
(_coarsen_matrix). Reference: GAMGAgglomeration Galerkin products,
src/OpenFOAM/matrices/lduMatrix/solvers/GAMG/. These tests pin the two
paths to each other level by level and end-to-end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.apps.cases import make_cavity
from foamtpu.core.dimensions import dimTime
from foamtpu.ops import fvm
from foamtpu.ops import slot as slot_mod
from foamtpu.ops import stencil as stencil_mod
from foamtpu.solvers import linear
from foamtpu.solvers.linear import gamg as G


@pytest.fixture(scope="module")
def cavity64():
    mesh, state, cfg = make_cavity(64, p_solver={
        "solver": "GAMG", "preconditioner": "polynomial",
        "tolerance": 1e-7, "relTol": 0.0, "maxIter": 200})
    return mesh, state, cfg


def _pressure_matrix(mesh, state):
    rng = np.random.default_rng(0)
    rAf = jnp.asarray(0.1 + rng.random(mesh.n_faces), mesh.v.dtype)
    rAf_slot = slot_mod.from_flat(mesh, rAf)
    return fvm.laplacian(mesh, rAf, state["p"], corrected=False,
                         gamma_dims=dimTime, gamma_slot=rAf_slot)


def test_plane_levels_built(cavity64):
    mesh, state, cfg = cavity64
    g = cfg.p_controls["_gamg"]
    assert len(g.levels) >= 2
    assert all(lv.plane_ok for lv in g.levels)
    # structured cavity: zero irregular remainder
    for lv in g.levels:
        assert lv.pfb_cells.shape[0] == 0
        assert lv.irr_plane_c.shape[0] == 0


def test_plane_coarsening_matches_gather(cavity64):
    mesh, state, cfg = cavity64
    g = cfg.p_controls["_gamg"]
    pEqn = _pressure_matrix(mesh, state)
    ctl = dict(cfg.p_controls)
    pEqn2, _ = linear.prep_pressure(pEqn, True, ctl, 0, 0.0)
    d_eff = pEqn2.diag_eff(mesh)

    mats = g.coarsen_all(d_eff, pEqn2.upper, pEqn2.lower)
    ops = g._ops(mesh, mats)

    rng = np.random.default_rng(1)
    diag, planes, fbc = d_eff, pEqn2.soff, pEqn2.sfb
    for i, lv in enumerate(g.levels):
        diag, planes, fbc = G._coarsen_planes(lv, diag, planes, fbc)
        np.testing.assert_allclose(
            np.asarray(diag), np.asarray(mats[i + 1][0]),
            rtol=0, atol=1e-5)
        x = jnp.asarray(rng.standard_normal(lv.n_coarse), mesh.v.dtype)
        op_pl = stencil_mod.StencilOp(
            lv.plane_deltas, planes, lv.pfb_cells, lv.pfb_nbrs, fbc)
        y_ref = mats[i + 1][0] * x + ops[i + 1].apply_off(x)
        y_pl = diag * x + op_pl.apply_off(x)
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                                   rtol=0, atol=1e-4)


def test_prepare_selects_plane_path_and_solves(cavity64):
    mesh, state, cfg = cavity64
    g = cfg.p_controls["_gamg"]
    pEqn = _pressure_matrix(mesh, state)
    ctl = dict(cfg.p_controls)
    pEqn2, c2 = linear.prep_pressure(pEqn, True, ctl, 0, 0.0)
    prep = g.prepare(mesh, pEqn2)
    # plane path marks mats with (diag, None, None)
    assert prep["mats"][1][1] is None

    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(mesh.n_cells) * 1e-3,
                    mesh.v.dtype)
    m3 = pEqn2.replace_fields(source=pEqn2.source + b)
    x, perf = linear.solve(mesh, m3, state["p"].data, c2)
    assert float(perf.final_residual) < 1e-6
    assert int(perf.n_iterations) < 30
