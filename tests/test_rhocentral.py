"""rhoCentralFoam forwardStep: Mach 3 inviscid flow over a
forward-facing step (reference oracle: tutorials/compressible/
rhoCentralFoam/forwardStep — bow shock formation, bounded density,
stable explicit marching)."""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models.thermo import PerfectGas
from foamtpu.solvers import rhocentral

# forwardStep non-dimensionalisation: R/Cv chosen so c=1 at T=1
THERMO = PerfectGas(R=0.714286, Cv=1.78571, mu=0.0)


def step_mesh():
    d = parse_string(
        """
vertices (
    (0 0 0)     (0.6 0 0)   (0.6 0.2 0)  (0 0.2 0)
    (3 0.2 0)   (3 1 0)     (0.6 1 0)    (0 1 0)
    (0 0 0.05)  (0.6 0 0.05) (0.6 0.2 0.05) (0 0.2 0.05)
    (3 0.2 0.05) (3 1 0.05)  (0.6 1 0.05)  (0 1 0.05)
);
blocks (
    hex (0 1 2 3 8 9 10 11) (24 8 1) simpleGrading (1 1 1)
    hex (3 2 6 7 11 10 14 15) (24 32 1) simpleGrading (1 1 1)
    hex (2 4 5 6 10 12 13 14) (96 32 1) simpleGrading (1 1 1)
);
boundary (
    inlet { type patch; faces ((0 8 11 3) (3 11 15 7)); }
    outlet { type patch; faces ((4 12 13 5)); }
    bottom { type symmetryPlane; faces ((0 1 9 8)); }
    top { type symmetryPlane; faces ((7 15 14 6) (6 14 13 5)); }
    obstacle { type patch; faces ((1 2 10 9) (2 4 12 10)); }
    frontAndBack { type empty; faces (
        (0 3 2 1) (3 7 6 2) (2 6 5 4)
        (8 9 10 11) (11 10 14 15) (10 12 13 14) ); }
);
"""
    )
    return to_device(blockmesh.generate(d))


@pytest.fixture(scope="module")
def forward_step_result():
    mesh = step_mesh()
    rho0 = 1.0 / (THERMO.R * 1.0)

    def bcs(inlet_value, slip_kind="slip"):
        out = []
        for p in mesh.patches:
            if p.type == "empty":
                out.append(pf.PatchField(kind="empty", vfrac=0.0))
            elif p.name == "inlet":
                out.append(pf.fixed_value(inlet_value))
            elif p.name == "outlet":
                out.append(pf.zero_gradient())
            else:
                out.append(pf.make(slip_kind))
        return tuple(out)

    U = vol_vector(mesh, jnp.asarray([3.0, 0.0, 0.0]), name="U",
                   dims=dimVelocity,
                   bcs=bcs(jnp.asarray([3.0, 0.0, 0.0]), "slip"))
    T = vol_scalar(mesh, 1.0, name="T", dims=DimensionSet.of(0, 0, 0, 1),
                   bcs=bcs(jnp.asarray(1.0), "zeroGradient"))
    rho = vol_scalar(mesh, rho0, name="rho",
                     dims=DimensionSet.of(1, -3, 0),
                     bcs=bcs(jnp.asarray(rho0), "zeroGradient"))

    cfg = rhocentral.RhoCentralConfig(thermo=THERMO, second_order=False)
    chunk = rhocentral.make_chunk(mesh, cfg, 50)
    state = rhocentral.initial_state(mesh, rho, U, T, cfg)
    dt = jnp.asarray(0.0015, mesh.v.dtype)
    for _ in range(6):  # t = 0.45
        state, diag = chunk(state, dt)
    return mesh, state, diag


def test_stable_and_bounded(forward_step_result):
    mesh, state, diag = forward_step_result
    rho = np.asarray(state["rho"].data)
    u = np.asarray(state["U"].data)
    T = np.asarray(state["T"].data)
    assert np.isfinite(rho).all() and np.isfinite(u).all()
    assert rho.min() > 0.1
    # max density ratio across a M=3 normal shock is (gamma+1)M^2/((gamma-1)M^2+2)
    # = 3.857; reflections push it higher but bounded
    assert rho.max() < 8.0 * 1.4
    assert T.min() > 0.1
    assert float(diag["courant_max"]) < 1.0


def test_bow_shock_formed(forward_step_result):
    mesh, state, diag = forward_step_result
    c = np.asarray(mesh.c)
    p = np.asarray(state["p"])
    # pressure jump ahead of the step (detached bow shock): probes just
    # upstream of the step face at x=0.6, y<0.2
    probe = (c[:, 0] > 0.5) & (c[:, 0] < 0.6) & (c[:, 1] < 0.2)
    assert p[probe].max() > 3.0  # inlet p=1; normal-shock p2/p1 = 10.3
    # undisturbed supersonic inflow region keeps inlet conditions
    probe_in = (c[:, 0] < 0.1) & (c[:, 1] > 0.6)
    np.testing.assert_allclose(p[probe_in], 1.0, rtol=0.2)


def test_mass_conservation_consistency(forward_step_result):
    mesh, state, diag = forward_step_result
    # domain mass stays within physical bounds (inflow/outflow balance):
    v_tot = float(jnp.sum(mesh.v))
    rho_mean = float(diag["mass"]) / v_tot
    assert 1.0 < rho_mean < 4.0


def test_rhocentraldym_translating_freestream():
    """rhoCentralDyMFoam core: a uniform still gas on a rigidly
    translating mesh is preserved (free-stream preservation of the
    relative-flux KNP step) while pure rhoCentral on the same
    ABSOLUTE formulation would advect the state."""
    import jax

    from foamtpu.mesh import moving
    from foamtpu.solvers import rhocentral as rc

    d = parse_string("""
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (12 12 1) simpleGrading (1 1 1) );
boundary
(
    walls { type slip; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
""")
    pm = blockmesh.generate(d)
    mesh = to_device(pm)
    th = PerfectGas(R=287.0, Cv=717.5, mu=0.0)
    bcs_U, bcs_s = [], []
    for p in mesh.patches:
        if p.type == "empty":
            bcs_U.append(pf.PatchField(kind="empty", vfrac=0.0))
            bcs_s.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs_U.append(pf.PatchField(kind="slip", vfrac=0.0))
            bcs_s.append(pf.zero_gradient())
    rho0 = 1e5 / (287.0 * 300.0)
    rho = vol_scalar(mesh, rho0, name="rho", bcs=tuple(bcs_s))
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U",
                   bcs=tuple(bcs_U))
    T = vol_scalar(mesh, 300.0, name="T", bcs=tuple(bcs_s))
    cfg = rhocentral.RhoCentralConfig(thermo=th, second_order=False)
    state = rhocentral.initial_state(mesh, rho, U, T, cfg)
    topo = moving.topo_from_poly(pm, mesh.v.dtype)
    state["topo"] = topo
    state["points0"] = jnp.asarray(pm.points, mesh.v.dtype)
    state["t"] = jnp.zeros((), mesh.v.dtype)
    pts_fn, umesh_fn = moving.linear_motion((5.0, 0.0, 0.0))
    step = jax.jit(lambda s, dt: rc.rhocentraldym_step(
        mesh, s, dt, cfg, pts_fn, umesh_fn))
    for _ in range(20):
        state, diag = step(state, jnp.asarray(5e-5, mesh.v.dtype))
    assert float(jnp.max(jnp.abs(state["U"].data))) < 1e-4
    assert float(jnp.max(jnp.abs(state["T"].data - 300.0))) < 1e-2
    assert abs(float(diag["mass"]) - rho0 * 0.1) < 1e-6 * rho0
