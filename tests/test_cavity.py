"""End-to-end icoFoam lid-driven cavity (the reference's canonical
minimal case: tutorials/incompressible/icoFoam/cavity).

Oracles (reference output unavailable — see SURVEY.md §0):
physics invariants (continuity, boundedness, steady state), grid
convergence, and regression goldens recorded from the first validated
run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.dimensions import dimPressure, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import to_device
from foamtpu.solvers import piso

from test_blockmesh import cavity_mesh


def cavity_fields(mesh):
    ubcs, pbcs = [], []
    for p in mesh.patches:
        if p.type == "empty":
            ubcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            pbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.name == "movingWall":
            ubcs.append(pf.fixed_value(jnp.asarray([1.0, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())
        else:
            ubcs.append(pf.fixed_value(jnp.asarray([0.0, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())
    # p dims: kinematic pressure m^2/s^2
    from foamtpu.core.dimensions import DimensionSet

    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity, bcs=tuple(ubcs))
    p = vol_scalar(mesh, 0.0, name="p", dims=DimensionSet.of(0, 2, -2),
                   bcs=tuple(pbcs))
    return U, p


def run_cavity(n=20, nsteps=100, dt=0.005, nu=0.01):
    mesh = to_device(cavity_mesh(n))
    U, p = cavity_fields(mesh)
    cfg = piso.PisoConfig(
        nu=nu,
        n_correctors=2,
        n_non_orth=0,
        p_controls={"solver": "PCG", "preconditioner": "diagonal",
                    "tolerance": 1e-6, "relTol": 0.0, "maxIter": 2000},
        u_controls={"solver": "smoothSolver", "tolerance": 1e-5,
                    "relTol": 0.0, "maxIter": 500, "nSweeps": 2},
    )
    step = piso.make_step(mesh, cfg)
    state = piso.initial_state(mesh, U, p)
    dt = jnp.asarray(dt, mesh.v.dtype)
    last = None
    for i in range(nsteps):
        prev_u = state["U"].data
        state, diag = step(state, dt)
        last = diag
    du = float(jnp.max(jnp.abs(state["U"].data - prev_u)))
    return mesh, state, last, du


@pytest.fixture(scope="module")
def cavity20():
    return run_cavity(20, nsteps=100)


def test_cavity_runs_and_converges(cavity20):
    mesh, state, diag, du = cavity20
    u = np.asarray(state["U"].data)
    # bounded by lid velocity
    assert np.abs(u).max() <= 1.0 + 1e-3
    # z-velocity identically ~0 (2D)
    assert np.abs(u[:, 2]).max() < 1e-6
    # continuity: divergence-free flux field
    assert float(diag["continuity"]) < 1e-5
    # steady state essentially reached by t=0.5 (Re=10)
    assert du < 2e-4
    # pressure solve converged
    assert float(diag["p_final"]) < 1e-6


def test_cavity_physics(cavity20):
    mesh, state, diag, du = cavity20
    # cells are ordered y-fastest: reshape -> [i_x, j_y]
    u_grid = np.asarray(state["U"].data).reshape(20, 20, 3)[..., 0]
    # u along the vertical centerline (x=0.05): positive near the lid,
    # negative return flow below
    ucl = 0.5 * (u_grid[9, :] + u_grid[10, :])
    assert ucl[-1] > 0.5          # near lid (top row)
    assert ucl.min() < -0.02      # return flow
    # primary vortex: net angular momentum is clockwise (lid drives +x at top)
    c = np.asarray(mesh.c) - np.array([0.05, 0.05, 0.005])
    uu = np.asarray(state["U"].data)
    lz = np.sum(c[:, 0] * uu[:, 1] - c[:, 1] * uu[:, 0])
    assert lz < 0


def test_cavity_grid_convergence():
    _, s10, d10, _ = run_cavity(10, nsteps=60)
    _, s20, d20, _ = run_cavity(20, nsteps=60)
    # kinetic energy integral converges with refinement (sanity: same
    # magnitude, difference modest)
    def ke(mesh_n, s):
        u = np.asarray(s["U"].data)
        return float(np.mean(np.sum(u * u, axis=1)))

    k10, k20 = ke(10, s10), ke(20, s20)
    assert abs(k10 - k20) / k20 < 0.25
    assert float(d10["continuity"]) < 1e-5
    assert float(d20["continuity"]) < 1e-5


GOLDEN_UCL = np.array([
    -0.017685, -0.046086, -0.070346, -0.09222, -0.112751, -0.1325,
    -0.151547, -0.169462, -0.185223, -0.197112, -0.202589, -0.198158,
    -0.179274, -0.140323, -0.074767, 0.024439, 0.163997, 0.348883,
    0.58027, 0.852023,
])
GOLDEN_VCL = np.array([
    0.043238, 0.109501, 0.152965, 0.174689, 0.17771, 0.165628,
    0.141914, 0.109609, 0.071243, 0.028943, -0.01538, -0.059788,
    -0.102053, -0.139413, -0.1684, -0.184832, -0.184097, -0.161848,
    -0.115184, -0.044569,
])
GOLDEN_KE = 0.0632169


def test_cavity_regression_goldens(cavity20):
    """Regression goldens recorded from the first validated run
    (f32, 20x20, 100 steps of dt=0.005; steady to du=1e-7). The u_min
    ~= -0.20 on the vertical centerline matches the community-known
    icoFoam cavity (Re=10) result. Update deliberately if the
    discretisation changes."""
    mesh, state, diag, du = cavity20
    u_grid = np.asarray(state["U"].data).reshape(20, 20, 3)
    ucl = 0.5 * (u_grid[9, :, 0] + u_grid[10, :, 0])
    vcl = 0.5 * (u_grid[:, 9, 1] + u_grid[:, 10, 1])
    np.testing.assert_allclose(ucl, GOLDEN_UCL, atol=2e-4)
    np.testing.assert_allclose(vcl, GOLDEN_VCL, atol=2e-4)
    ke = float(np.mean(np.sum(u_grid**2, axis=-1)))
    np.testing.assert_allclose(ke, GOLDEN_KE, rtol=1e-3)
