"""interMixingFoam tests (reference: applications/solvers/multiphase/
interMixingFoam/)."""

import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import interfoam, intermixing as imx

BOX2D = """
convertToMeters 1;
vertices
(
    (0 0 0) (0.1 0 0) (0.1 0.1 0) (0 0.1 0)
    (0 0 0.01) (0.1 0 0.01) (0.1 0.1 0.01) (0 0.1 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) (20 10 1) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _setup(D23=1e-4):
    mesh = to_device(blockmesh.generate(parse_string(BOX2D)))
    flow = interfoam.InterConfig(
        rho1=1.0, rho2=1000.0, nu1=1.5e-5, nu2=1e-6, sigma=0.0,
        g=(0.0, 0.0, 0.0), n_correctors=2, momentum_predictor=False)
    cfg = imx.InterMixingConfig(flow=flow, rho3=1000.0, nu3=1e-6,
                                D23=D23)
    # no air; liquid A on the left half, liquid B on the right
    c = np.asarray(mesh.c)
    a2 = (c[:, 0] < 0.05).astype(float)
    alpha1 = vol_scalar(mesh, 0.0, name="alpha1")
    alpha2 = vol_scalar(mesh, jnp.asarray(a2, mesh.v.dtype),
                        name="alpha2")
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U")
    p_rgh = vol_scalar(mesh, 0.0, name="p_rgh")
    state = imx.initial_state(mesh, U, p_rgh, alpha1, alpha2, cfg)
    return mesh, state, cfg


def test_miscible_diffusion_conserves_and_spreads():
    """Two still miscible liquids: alpha2 total is conserved while the
    step profile diffuses (variance of the interface grows); the
    triple stays bounded (alpha3 >= 0)."""
    mesh, state, cfg = _setup()
    step = imx.make_step(mesh, cfg)
    v = np.asarray(mesh.v)
    a2_0 = np.asarray(state["alpha2"].data)
    m0 = float((a2_0 * v).sum())
    # mixedness: zero for the pure step profile, grows with diffusion
    mix0 = float((a2_0 * (1.0 - a2_0)).mean())
    diag = None
    for _ in range(20):
        state, diag = step(state, jnp.asarray(1e-3, mesh.v.dtype))
    a2 = np.asarray(state["alpha2"].data)
    m1 = float((a2 * v).sum())
    assert abs(m1 - m0) / m0 < 1e-3, "alpha2 not conserved"
    mix1 = float((a2 * (1.0 - a2)).mean())
    assert mix1 > mix0 + 0.005, "no diffusion happened"
    assert float(diag["alpha3_min"]) >= 0.0
    assert a2.min() >= 0.0 and a2.max() <= 1.0 + 1e-6


def test_air_phase_stays_immiscible():
    """With an air layer present, alpha1 keeps its sharp MULES-bounded
    interface (no D23 leakage into alpha1)."""
    mesh, state, cfg = _setup()
    c = np.asarray(mesh.c)
    a1 = (c[:, 1] > 0.05).astype(float)          # air on top
    state["alpha1"] = state["alpha1"].with_data(
        jnp.asarray(a1, mesh.v.dtype))
    a2 = np.asarray(state["alpha2"].data) * (1.0 - a1)
    state["alpha2"] = state["alpha2"].with_data(
        jnp.asarray(a2, mesh.v.dtype))
    state = imx.initial_state(mesh, state["U"], state["p_rgh"],
                              state["alpha1"], state["alpha2"], cfg)
    step = imx.make_step(mesh, cfg)
    v = np.asarray(mesh.v)
    m1_0 = float((np.asarray(state["alpha1"].data) * v).sum())
    for _ in range(10):
        state, diag = step(state, jnp.asarray(1e-3, mesh.v.dtype))
    a1_n = np.asarray(state["alpha1"].data)
    assert abs(float((a1_n * v).sum()) - m1_0) / m1_0 < 1e-3
    assert a1_n.min() >= -1e-6 and a1_n.max() <= 1.0 + 1e-6
    # air region did not absorb liquid A
    assert float(np.asarray(state["alpha2"].data)[a1_n > 0.99].max()
                 if (a1_n > 0.99).any() else 0.0) < 0.05
