"""settlingFoam tests (reference: applications/solvers/multiphase/
settlingFoam/): dispersed phase drifts toward the bottom of a still
tank while total dispersed mass is conserved."""

import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import settling

TANK = """
convertToMeters 1;
vertices
(
    (0 0 0) (0.1 0 0) (0.1 0.2 0) (0 0.2 0)
    (0 0 0.01) (0.1 0 0.01) (0.1 0.2 0.01) (0 0.2 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) (5 20 1) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def test_settling_drift_and_conservation():
    mesh = to_device(blockmesh.generate(parse_string(TANK)))
    cfg = settling.SettlingConfig(
        rhoc=1000.0, rhod=1042.0, muc=1e-3,
        plastic_coeff=1e-4, plastic_exp=3.0,
        V0=(0.0, -0.01, 0.0), a=5.0, alpha_min=0.0,
        n_correctors=2, momentum_predictor=False,
        g=(0.0, -9.81, 0.0))
    alpha = vol_scalar(mesh, 0.2, name="alpha")
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U")
    p_rgh = vol_scalar(mesh, 0.0, name="p_rgh")
    state = settling.initial_state(mesh, U, p_rgh, alpha, cfg)
    step = settling.make_step(mesh, cfg)

    c = np.asarray(mesh.c)
    v = np.asarray(mesh.v)
    a0 = np.asarray(state["alpha"].data)
    com0 = float((a0 * v * c[:, 1]).sum() / (a0 * v).sum())
    tot0 = float((a0 * v).sum())
    for _ in range(40):
        state, diag = step(state, jnp.asarray(0.05, mesh.v.dtype))
    a1 = np.asarray(state["alpha"].data)
    com1 = float((a1 * v * c[:, 1]).sum() / (a1 * v).sum())
    tot1 = float((a1 * v).sum())
    # centre of mass of the dispersed phase moved DOWN
    assert com1 < com0 - 0.0015, (com0, com1)
    # total dispersed volume fraction conserved (walls: no drift out)
    assert abs(tot1 - tot0) / tot0 < 5e-3
    assert a1.min() >= 0.0 and a1.max() <= 1.0 + 1e-6
    # bottom cells enriched, top depleted
    bot = a1[c[:, 1] < 0.02].mean()
    top = a1[c[:, 1] > 0.18].mean()
    assert bot > top + 0.01


def test_hindered_settling_slows_at_high_alpha():
    """The `simple` law: Vdj falls exponentially with alpha."""
    cfg = settling.SettlingConfig(V0=(0.0, -0.01, 0.0), a=8.84)
    lo = settling.vdj(cfg, jnp.asarray([0.05]))
    hi = settling.vdj(cfg, jnp.asarray([0.5]))
    assert abs(float(hi[0, 1])) < 0.1 * abs(float(lo[0, 1]))
    # general law runs too
    cfg2 = cfg._replace(vdj_model="general", a1=0.1)
    g = settling.vdj(cfg2, jnp.asarray([0.2]))
    assert np.isfinite(float(g[0, 1]))
