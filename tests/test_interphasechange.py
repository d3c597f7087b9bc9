"""interPhaseChangeFoam tests (reference: applications/solvers/
multiphase/interPhaseChangeFoam/ + phaseChangeTwoPhaseMixtures)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import interfoam, interphasechange as ipc

BOX2D = """
convertToMeters 1;
vertices
(
    (0 0 0) (0.1 0 0) (0.1 0.1 0) (0 0.1 0)
    (0 0 0.01) (0.1 0 0.01) (0.1 0.1 0.01) (0 0.1 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) (10 10 1) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _setup(p0, alpha0, model="SchnerrSauer"):
    mesh = to_device(blockmesh.generate(parse_string(BOX2D)))
    flow = interfoam.InterConfig(
        rho1=1000.0, rho2=0.02, nu1=9e-7, nu2=4.3e-4, sigma=0.07,
        g=(0.0, 0.0, 0.0), n_correctors=2, momentum_predictor=False)
    cfg = ipc.PhaseChangeConfig(flow=flow, model=model, p_sat=2300.0)
    p_rgh = vol_scalar(mesh, p0, name="p_rgh")
    alpha = vol_scalar(mesh, alpha0, name="alpha1")
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U")
    state = ipc.initial_state(mesh, U, p_rgh, alpha, cfg)
    return mesh, state, cfg


def test_vaporisation_below_psat():
    """Liquid at p < pSat vaporises: alpha1 decreases, stays bounded."""
    mesh, state, cfg = _setup(p0=500.0, alpha0=0.99)
    step = ipc.make_step(mesh, cfg)
    a0 = float(jnp.mean(state["alpha"].data))
    for _ in range(10):
        state, diag = step(state, jnp.asarray(1e-4, mesh.v.dtype))
    a1 = float(jnp.mean(state["alpha"].data))
    assert a1 < a0 - 1e-6, "no vaporisation happened"
    assert float(diag["alpha_min"]) >= 0.0
    assert float(diag["alpha_max"]) <= 1.0
    assert float(diag["vdot_min"]) < 0.0     # vaporisation rate active


def test_condensation_above_psat():
    """Vapour-laden mixture at p >> pSat condenses: alpha1 rises."""
    mesh, state, cfg = _setup(p0=1.0e5, alpha0=0.5)
    step = ipc.make_step(mesh, cfg)
    a0 = float(jnp.mean(state["alpha"].data))
    for _ in range(5):
        state, diag = step(state, jnp.asarray(1e-5, mesh.v.dtype))
    a1 = float(jnp.mean(state["alpha"].data))
    assert a1 > a0 + 1e-6, "no condensation happened"
    assert float(diag["alpha_max"]) <= 1.0


def test_equilibrium_no_vapour_no_change():
    """Pure liquid at p > pSat: nothing to condense, no vaporisation —
    alpha stays 1 and the velocity stays at rest."""
    mesh, state, cfg = _setup(p0=1.0e5, alpha0=1.0)
    step = ipc.make_step(mesh, cfg)
    for _ in range(3):
        state, diag = step(state, jnp.asarray(1e-5, mesh.v.dtype))
    assert float(jnp.min(state["alpha"].data)) > 0.999
    assert float(jnp.max(jnp.abs(state["U"].data))) < 1e-4


def test_kunz_and_merkle_models_run():
    """The alternative cavitation closures produce the same directional
    behaviour."""
    for model in ("Kunz", "Merkle"):
        mesh, state, cfg = _setup(p0=500.0, alpha0=0.9, model=model)
        step = ipc.make_step(mesh, cfg)
        a0 = float(jnp.mean(state["alpha"].data))
        for _ in range(5):
            state, diag = step(state, jnp.asarray(1e-3, mesh.v.dtype))
        assert float(jnp.mean(state["alpha"].data)) < a0 - 1e-7
        assert float(diag["alpha_min"]) >= 0.0
