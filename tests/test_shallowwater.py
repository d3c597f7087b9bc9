"""shallowWaterFoam tests (reference:
applications/solvers/shallowWater/shallowWaterFoam/)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import shallowwater as sw

BASIN = """
convertToMeters 1;
vertices
(
    (0 0 0) (10 0 0) (10 1 0) (0 1 0)
    (0 0 1) (10 0 1) (10 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (40 4 1) simpleGrading (1 1 1) );
boundary
(
    sides { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _fields(mesh, h_init, h0):
    hb, ub = [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            hb.append(pf.PatchField(kind="empty", vfrac=0.0))
            ub.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            hb.append(pf.zero_gradient())
            ub.append(pf.PatchField(kind="slip", vfrac=0.0))
    h = vol_scalar(mesh, 1.0, name="h", dims=DimensionSet.of(0, 1, 0),
                   bcs=tuple(hb)).with_data(
        jnp.asarray(h_init, mesh.v.dtype))
    hU = vol_vector(mesh, jnp.zeros(3), name="hU",
                    dims=DimensionSet.of(0, 2, -1), bcs=tuple(ub))
    return h, hU


def test_seiche_standing_wave():
    """Closed flat-bottom basin, cosine surface perturbation: the
    gravity standing wave flips sign after T/2 = L/sqrt(gH), and water
    volume is conserved."""
    mesh = to_device(blockmesh.generate(parse_string(BASIN)))
    c = np.asarray(mesh.c)
    amp, H, L = 0.01, 1.0, 10.0
    pert0 = amp * np.cos(math.pi * c[:, 0] / L)
    h, hU = _fields(mesh, H + pert0, np.zeros(mesh.n_cells))
    cfg = sw.ShallowWaterConfig(n_outer=2, n_correctors=2,
                                div_scheme="linear")
    state = sw.initial_state(mesh, h, hU, np.zeros(mesh.n_cells))
    v = np.asarray(mesh.v)
    vol0 = float((np.asarray(h.data) * v).sum())
    step = jax.jit(lambda s, d: sw.shallowwater_step(mesh, s, d, cfg))
    dt = jnp.asarray(0.02, mesh.v.dtype)
    half_period = L / math.sqrt(9.81 * H)    # ~3.19 s
    n = int(round(half_period / 0.02))
    for _ in range(n):
        state, diag = step(state, dt)
    hd = np.asarray(state["h"].data)
    assert np.isfinite(hd).all()
    vol1 = float((hd * v).sum())
    assert abs(vol1 - vol0) / vol0 < 1e-4
    # anti-correlated with the initial perturbation (phase flip)
    pert1 = hd - H
    corr = float((pert0 * pert1).sum()
                 / max(np.linalg.norm(pert0) * np.linalg.norm(pert1),
                       1e-30))
    assert corr < -0.6, corr
    assert np.abs(pert1).max() > 0.3 * amp   # not over-damped


def test_lake_at_rest_well_balanced():
    """Varying bed h0 with flat free surface (h + h0 = const), hU = 0:
    the -g h grad(h+h0) force and the phih0 flux must balance so the
    lake stays at rest (the classic well-balanced property)."""
    mesh = to_device(blockmesh.generate(parse_string(BASIN)))
    c = np.asarray(mesh.c)
    h0 = 0.3 * np.exp(-((c[:, 0] - 5.0) / 1.5) ** 2)   # bed bump
    h_init = 1.0 - h0                                  # flat surface
    h, hU = _fields(mesh, h_init, h0)
    cfg = sw.ShallowWaterConfig(n_outer=1, n_correctors=2,
                                div_scheme="linear")
    state = sw.initial_state(mesh, h, hU, h0)
    step = jax.jit(lambda s, d: sw.shallowwater_step(mesh, s, d, cfg))
    dt = jnp.asarray(0.02, mesh.v.dtype)
    for _ in range(50):
        state, diag = step(state, dt)
    U = np.asarray(state["U"].data)
    assert np.isfinite(U).all()
    # residual spurious velocity far below the wave scale sqrt(g*amp)
    assert np.abs(U).max() < 5e-3, np.abs(U).max()
    surf = np.asarray(state["h"].data) + h0
    assert np.abs(surf - 1.0).max() < 2e-3
