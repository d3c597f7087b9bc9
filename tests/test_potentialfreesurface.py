"""potentialFreeSurfaceFoam tests (reference: applications/solvers/
multiphase/potentialFreeSurfaceFoam/ + waveSurfacePressure BC):
small-amplitude gravity-wave sloshing in a closed basin."""

import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import piso as piso_mod
from foamtpu.solvers import potentialfreesurface as pfs

BASIN = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 0.5 0) (0 0.5 0)
    (0 0 0.05) (1 0 0.05) (1 0.5 0.05) (0 0.5 0.05)
);
blocks ( hex (0 1 2 3 4 5 6 7) (20 10 1) simpleGrading (1 1 1) );
boundary
(
    freeSurface { type patch; faces ((3 7 6 2)); }
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _setup(zeta_amp=0.01):
    mesh = to_device(blockmesh.generate(parse_string(BASIN)))
    fs_idx = [i for i, p in enumerate(mesh.patches)
              if p.name == "freeSurface"][0]
    flow = piso_mod.PisoConfig(nu=1e-6, n_correctors=2,
                               momentum_predictor=False)
    cfg = pfs.FreeSurfaceConfig(flow=flow, fs_patch=fs_idx, g_mag=9.81)
    # tilted initial surface: zeta = amp * cos(pi x / L)
    sl = mesh.patches[fs_idx].slice
    xf = np.asarray(mesh.cf)[sl, 0]
    zeta0 = zeta_amp * np.cos(np.pi * xf / 1.0)
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U")
    p = vol_scalar(mesh, 0.0, name="p")
    state = pfs.initial_state(mesh, U, p, cfg, zeta0=zeta0)
    return mesh, state, cfg, xf


def test_gravity_wave_oscillates_and_conserves_volume():
    """The tilted surface drives a restoring flow: the elevation at the
    left end falls through zero (oscillation), total surface volume
    stays ~0, and the amplitude does not blow up."""
    mesh, state, cfg, xf = _setup()
    step = pfs.make_step(mesh, cfg)
    # standing-wave mode 1: omega^2 = g k tanh(k h); k = pi/L
    # L = 1, h = 0.5: omega = sqrt(9.81*pi*tanh(pi/2)) = 5.24 rad/s
    # -> period 1.2 s. Step to ~half a period and check sign flip.
    left0 = float(state["zeta"][np.argmin(xf)])
    assert left0 > 0
    dt = 0.01
    signs = []
    for i in range(80):
        state, diag = step(state, jnp.asarray(dt, mesh.v.dtype))
        signs.append(float(state["zeta"][np.argmin(xf)]))
    z = np.asarray(signs)
    assert z.min() < -0.1 * left0, "no oscillation (no sign flip)"
    assert np.abs(z).max() < 3.0 * left0, "amplitude blew up"
    # volume conservation of the surface displacement
    sl = mesh.patches[cfg.fs_patch].slice
    w = np.asarray(mesh.mag_sf)[sl]
    assert abs(float((np.asarray(state["zeta"]) * w).sum())) < 1e-8


def test_flat_surface_stays_at_rest():
    mesh, state, cfg, _ = _setup(zeta_amp=0.0)
    step = pfs.make_step(mesh, cfg)
    for _ in range(5):
        state, diag = step(state, jnp.asarray(0.01, mesh.v.dtype))
    assert float(jnp.max(jnp.abs(state["U"].data))) < 1e-6
    assert float(jnp.max(jnp.abs(state["zeta"]))) < 1e-8
