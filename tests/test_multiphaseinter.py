"""multiphaseInterFoam (reference: applications/solvers/multiphase/
multiphaseInterFoam/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import CAVITY_BLOCKMESH
from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import VolField, vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import multiphaseinter as mpi_mod


def test_three_phase_column_settles():
    """Three phases initialised INVERTED (heaviest on top): the
    heaviest sinks, the lightest rises, each phase's volume is
    conserved and all fractions stay in [0,1] with sum 1."""
    d = parse_string(CAVITY_BLOCKMESH.replace("{n}", "16"))
    mesh = to_device(blockmesh.generate(d))
    bw, bzg = [], []
    for p in mesh.patches:
        if p.type == "empty":
            bw.append(pf.PatchField(kind="empty", vfrac=0.0))
            bzg.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bw.append(pf.fixed_value(jnp.zeros(3)))
            bzg.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(bw))
    p_rgh = vol_scalar(mesh, 0.0, name="p_rgh",
                       dims=DimensionSet.of(1, -1, -2), bcs=tuple(bzg))
    c = np.asarray(mesh.c)
    y = c[:, 1]
    x = c[:, 0]
    # tilted interfaces: the inverted column is an unstable EQUILIBRIUM
    # on a symmetric grid — the tilt seeds the overturn deterministically
    A0 = np.zeros((mesh.n_cells, 3), np.float32)
    A0[:, 0] = y > 0.066 + 0.015 * (x / 0.1 - 0.5)
    A0[:, 2] = y < 0.033 + 0.015 * (x / 0.1 - 0.5)
    A0[:, 1] = np.clip(1.0 - A0[:, 0] - A0[:, 2], 0.0, 1.0)
    a0 = vol_scalar(mesh, 0.0, bcs=tuple(bzg))
    alphas = VolField(data=jnp.asarray(A0), bcs=a0.bcs, name="alphas")
    cfg = mpi_mod.MultiphaseConfig(
        rhos=(1000.0, 500.0, 100.0), nus=(1e-5, 1e-5, 1e-5),
        sigmas={(0, 1): 0.0, (1, 2): 0.0, (0, 2): 0.0},
        n_correctors=2)
    state = mpi_mod.initial_state(mesh, U, p_rgh, alphas, cfg)
    step = mpi_mod.make_step(mesh, cfg)
    v = np.asarray(mesh.v)
    m0 = (A0 * v[:, None]).sum(axis=0)
    y0 = (A0 * (v * y)[:, None]).sum(axis=0) / m0
    dt = jnp.asarray(2e-3, mesh.v.dtype)
    for _ in range(100):
        state, diag = step(state, dt)
    A = np.asarray(state["alphas"].data)
    assert np.isfinite(A).all()
    assert A.min() > -1e-4 and A.max() < 1.0 + 1e-4
    assert np.allclose(A.sum(axis=1), 1.0, atol=1e-4)
    m1 = (A * v[:, None]).sum(axis=0)
    assert np.allclose(m1, m0, rtol=2e-2)
    y1 = (A * (v * y)[:, None]).sum(axis=0) / m1
    # heavy centroid moved DOWN, light centroid moved UP
    assert y1[0] < y0[0] - 1e-3
    assert y1[2] > y0[2] + 1e-3
