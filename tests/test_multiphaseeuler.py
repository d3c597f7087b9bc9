"""multiphaseEulerFoam (solvers/multiphaseeuler.py): N-phase
Euler-Euler with pairwise blended drag and a shared pressure
(reference: applications/solvers/multiphase/multiphaseEulerFoam/)."""

import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import CAVITY_BLOCKMESH
from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import VolField, vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import multiphaseeuler as mpe


def _setup(n=16):
    d = parse_string(CAVITY_BLOCKMESH.replace("{n}", str(n)))
    mesh = to_device(blockmesh.generate(d))
    bw, bzg = [], []
    for p_ in mesh.patches:
        if p_.type == "empty":
            bw.append(pf.PatchField(kind="empty", vfrac=0.0))
            bzg.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bw.append(pf.fixed_value(jnp.zeros(3)))
            bzg.append(pf.zero_gradient())
    return mesh, tuple(bw), tuple(bzg)


def test_three_phase_stratification():
    """Closed box, three phases (air/oil/water): a dispersed air band
    inside the water column rises relative to water, every fraction
    stays bounded, sum(alpha)=1 exactly, and per-phase volume is
    conserved by the MULES advection + renormalisation."""
    mesh, bw, bzg = _setup()
    c = np.asarray(mesh.c)
    v = np.asarray(mesh.v)
    # air band low in the box, oil layer on top, water elsewhere
    band = (c[:, 1] > 0.02) & (c[:, 1] < 0.04)
    top = c[:, 1] > 0.08
    a_air = np.where(band, 0.1, 1e-4)
    a_oil = np.where(top, 0.95, 1e-4)
    a_wat = 1.0 - a_air - a_oil
    A = jnp.asarray(np.stack([a_air, a_oil, a_wat], axis=1)
                    .astype(np.float32))
    alphas = VolField(data=A, bcs=bzg, name="alphas")
    Us = [vol_vector(mesh, jnp.zeros(3), name=f"U{i}",
                     dims=dimVelocity, bcs=bw) for i in range(3)]
    p = vol_scalar(mesh, 0.0, name="p",
                   dims=DimensionSet.of(1, -1, -2), bcs=bzg)
    cfg = mpe.MultiphaseEulerConfig(
        rhos=(1.2, 900.0, 1000.0), nus=(1.5e-5, 1e-5, 1e-6),
        ds=(3e-3, 1e-3, 1e-3), n_correctors=2)
    state = mpe.initial_state(mesh, Us, p, alphas)
    step = mpe.make_step(mesh, cfg)

    m0 = (np.asarray(A) * v[:, None]).sum(axis=0)
    y_air0 = float((np.asarray(A)[:, 0] * v * c[:, 1]).sum() / m0[0])
    dt = jnp.asarray(2e-4, mesh.v.dtype)
    for _ in range(40):
        state, diag = step(state, dt)
    A1 = np.asarray(state["alphas"].data)
    assert np.isfinite(A1).all()
    assert A1.min() > -1e-5 and A1.max() < 1.0 + 1e-5
    np.testing.assert_allclose(A1.sum(axis=1), 1.0, atol=1e-4)
    # per-phase volume conservation (closed box, renormalised MULES)
    m1 = (A1 * v[:, None]).sum(axis=0)
    np.testing.assert_allclose(m1, m0, rtol=0.05)
    # the dispersed air rises THROUGH the water where it is present
    ua = np.asarray(state["U0"].data)
    uw = np.asarray(state["U2"].data)
    sel = A1[:, 0] > 0.02
    assert (ua[sel, 1] - uw[sel, 1]).mean() > 0.0
    # and its centroid has moved up
    y_air1 = float((A1[:, 0] * v * c[:, 1]).sum() / m1[0])
    assert y_air1 > y_air0
    assert float(diag["continuity"]) < 1e-4


def test_two_phase_matches_twophaseeuler_shape():
    """With nP=2 the generalized solver reproduces the two-phase
    behaviour: dispersed air in water reaches an upward terminal rise
    velocity of the right magnitude (Schiller-Naumann balance)."""
    mesh, bw, bzg = _setup(8)
    A = jnp.full((mesh.n_cells, 2), 0.5, mesh.v.dtype)
    A = A.at[:, 0].set(0.05)
    A = A.at[:, 1].set(0.95)
    alphas = VolField(data=A, bcs=bzg, name="alphas")
    Us = [vol_vector(mesh, jnp.zeros(3), name=f"U{i}",
                     dims=dimVelocity, bcs=bw) for i in range(2)]
    p = vol_scalar(mesh, 0.0, name="p",
                   dims=DimensionSet.of(1, -1, -2), bcs=bzg)
    cfg = mpe.MultiphaseEulerConfig(
        rhos=(1.2, 1000.0), nus=(1.5e-5, 1e-6), ds=(3e-3, 1e-3),
        n_correctors=2)
    state = mpe.initial_state(mesh, Us, p, alphas)
    step = mpe.make_step(mesh, cfg)
    dt = jnp.asarray(5e-4, mesh.v.dtype)
    for _ in range(60):
        state, diag = step(state, dt)
    ua = np.asarray(state["U0"].data)
    uw = np.asarray(state["U1"].data)
    ur = (ua[:, 1] - uw[:, 1]).mean()
    # Schiller-Naumann terminal rise for a 3 mm bubble is O(0.2-0.4 m/s)
    assert 0.05 < ur < 1.0, ur
