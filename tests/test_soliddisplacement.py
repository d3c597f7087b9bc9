"""Stress analysis solvers (reference:
applications/solvers/stressAnalysis/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet
from foamtpu.core.fields import vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import soliddisplacement as sd

PLATE = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 0.5 0) (0 0.5 0)
    (0 0 0.01) (1 0 0.01) (1 0.5 0.01) (0 0.5 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) (20 10 1) simpleGrading (1 1 1) );
boundary
(
    left   { type symmetryPlane; faces ((0 4 7 3)); }
    right  { type patch; faces ((2 6 5 1)); }
    bottom { type symmetryPlane; faces ((1 5 4 0)); }
    top    { type patch; faces ((3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""

E, NU, RHO = 2e11, 0.3, 7854.0
SIGMA = 1e6  # applied tension [Pa]


def test_uniaxial_tension_plane_stress():
    """Quarter plate under uniaxial tension (symmetry left/bottom,
    traction right, free top): the exact solution is uniform
    sigma_xx = SIGMA, Dx = (SIGMA/E) x, Dy = -(nu SIGMA/E) y."""
    mesh = to_device(blockmesh.generate(parse_string(PLATE)))
    bcs = []
    traction = []
    for patch in mesh.patches:
        if patch.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            traction.append(None)
        elif patch.name in ("left", "bottom"):
            bcs.append(pf.PatchField(kind="symmetryPlane", vfrac=0.0))
            traction.append(None)
        elif patch.name == "right":
            bcs.append(pf.fixed_gradient(jnp.zeros(3)))
            # traction scaled by 1/rho like the D equation
            traction.append((np.array([SIGMA, 0.0, 0.0]) / RHO, 0.0))
        else:  # top: traction-free
            bcs.append(pf.fixed_gradient(jnp.zeros(3)))
            traction.append((np.zeros(3), 0.0))
    D = vol_vector(mesh, jnp.zeros(3), name="D",
                   dims=DimensionSet.of(0, 1, 0), bcs=tuple(bcs))
    cfg = sd.SolidConfig(rho=RHO, E=E, nu=NU, plane_stress=True,
                         steady=True, n_corr=20,
                         traction=tuple(traction))
    state = sd.initial_state(mesh, D, steady=True)
    step = jax.jit(lambda s, d: sd.solid_step(mesh, s, d, cfg))
    one = jnp.asarray(1.0, mesh.v.dtype)
    for _ in range(6):
        state, diag = step(state, one)
    Dd = np.asarray(state["D"].data)
    c = np.asarray(mesh.c)
    eps = SIGMA / E
    # displacement field matches the analytic linear solution
    assert np.abs(Dd[:, 0] - eps * c[:, 0]).max() < 0.05 * eps
    assert np.abs(Dd[:, 1] + NU * eps * c[:, 1]).max() < 0.05 * eps
    # stress recovery: sigma_xx uniform = SIGMA
    sig = np.asarray(sd.sigma_of(mesh, state["D"], cfg))
    assert abs(sig[:, 0, 0].mean() - SIGMA) / SIGMA < 0.02
    assert np.abs(sig[:, 0, 0] - SIGMA).max() / SIGMA < 0.1
    # sigma_yy ~ 0
    assert np.abs(sig[:, 1, 1]).max() / SIGMA < 0.1


def test_transient_elastodynamics_stable():
    """solidDisplacementFoam transient: a suddenly applied load starts
    an elastic wave; the d2dt2 march must stay finite and the mean
    displacement approach the static solution's order."""
    mesh = to_device(blockmesh.generate(parse_string(PLATE)))
    bcs, traction = [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            traction.append(None)
        elif patch.name in ("left", "bottom"):
            bcs.append(pf.PatchField(kind="symmetryPlane", vfrac=0.0))
            traction.append(None)
        elif patch.name == "right":
            bcs.append(pf.fixed_gradient(jnp.zeros(3)))
            traction.append((np.array([SIGMA, 0.0, 0.0]) / RHO, 0.0))
        else:
            bcs.append(pf.fixed_gradient(jnp.zeros(3)))
            traction.append((np.zeros(3), 0.0))
    D = vol_vector(mesh, jnp.zeros(3), name="D",
                   dims=DimensionSet.of(0, 1, 0), bcs=tuple(bcs))
    cfg = sd.SolidConfig(rho=RHO, E=E, nu=NU, plane_stress=True,
                         steady=False, n_corr=3,
                         traction=tuple(traction))
    state = sd.initial_state(mesh, D, steady=False)
    step = jax.jit(lambda s, d: sd.solid_step(mesh, s, d, cfg))
    # wave speed ~ sqrt(E/rho) ~ 5000 m/s, dx = 0.05 -> dt < 1e-5
    dt = jnp.asarray(5e-6, mesh.v.dtype)
    for _ in range(40):
        state, diag = step(state, dt)
    Dd = np.asarray(state["D"].data)
    assert np.isfinite(Dd).all()
    eps = SIGMA / E
    # displacement reached the static order of magnitude (wave has
    # crossed the plate a couple of times), no blow-up
    assert 0.1 * eps < np.abs(Dd[:, 0]).max() < 20 * eps
