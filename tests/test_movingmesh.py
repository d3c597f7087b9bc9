"""Dynamic mesh tests (reference: src/dynamicFvMesh/
solidBodyMotionFvMesh + pimpleDyMFoam)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh, moving, to_device

CAVITY = """
convertToMeters 0.1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (12 12 1) simpleGrading (1.5 1 1) );
boundary
(
    movingWall { type wall; faces ((3 7 6 2)); }
    fixedWalls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def test_device_geometry_matches_host():
    """update_geometry on perturbed points reproduces the host
    PolyMesh.update_geometry quantities."""
    pm = blockmesh.generate(parse_string(CAVITY))
    mesh = to_device(pm)
    topo = moving.topo_from_poly(pm, mesh.v.dtype)

    rng = np.random.default_rng(0)
    pts = pm.points + 0.002 * rng.standard_normal(pm.points.shape)
    pts[:, 2] = pm.points[:, 2]   # keep 2D extrusion planar

    # host reference
    pm.points = pts
    pm.update_geometry()

    m2 = moving.update_geometry(mesh, jnp.asarray(pts, mesh.v.dtype),
                                topo)
    assert np.allclose(np.asarray(m2.v), pm.v, rtol=2e-5)
    assert np.allclose(np.asarray(m2.sf), pm.sf, atol=1e-7)
    assert np.allclose(np.asarray(m2.cf), pm.cf, atol=1e-6)
    assert np.allclose(np.asarray(m2.c), pm.c, atol=1e-6)
    assert np.allclose(np.asarray(m2.weights), pm.weights, atol=2e-5)
    assert np.allclose(np.asarray(m2.delta_coeffs), pm.delta_coeffs,
                       rtol=2e-5)


def test_solid_body_motion_functions():
    pm = blockmesh.generate(parse_string(CAVITY))
    mesh = to_device(pm)
    p0 = jnp.asarray(pm.points, mesh.v.dtype)
    # linear
    pts, um = moving.linear_motion((1.0, 2.0, 0.0))
    p1 = pts(p0, 0.5)
    assert np.allclose(np.asarray(p1 - p0), [0.5, 1.0, 0.0], atol=1e-6)
    # rotation preserves distances from the axis
    pts_r, um_r = moving.rotating_motion((0.05, 0.05, 0.0), (0, 0, 1),
                                         2.0)
    p2 = pts_r(p0, 0.3)
    r0 = np.linalg.norm(np.asarray(p0)[:, :2] - [0.05, 0.05], axis=1)
    r1 = np.linalg.norm(np.asarray(p2)[:, :2] - [0.05, 0.05], axis=1)
    assert np.allclose(r0, r1, atol=1e-6)
    # mesh flux of a rigid translation: div(meshPhi) = 0 per cell
    phi_m = moving.mesh_flux(mesh, um, 0.0)
    from foamtpu.ops import surface

    div = np.asarray(surface.surface_sum(
        mesh, phi_m * mesh.face_active))
    assert np.abs(div).max() < 1e-7


def test_translating_cavity_galilean_invariance():
    """pimpleDyMFoam-style ALE: the lid-driven cavity on a uniformly
    translating mesh (walls carried along, relative fluxes) produces
    the SAME relative velocity field as the static cavity."""
    from foamtpu.bc import patchfields as pf
    from foamtpu.core.dimensions import DimensionSet, dimVelocity
    from foamtpu.core.fields import vol_scalar, vol_vector
    from foamtpu.solvers import pimpledym, piso

    V0 = np.array([0.7, 0.3, 0.0])   # frame velocity

    def build(umesh_vec):
        pm = blockmesh.generate(parse_string(CAVITY))
        mesh = to_device(pm)
        ub, pb = [], []
        for patch in mesh.patches:
            if patch.type == "empty":
                ub.append(pf.PatchField(kind="empty", vfrac=0.0))
                pb.append(pf.PatchField(kind="empty", vfrac=0.0))
            elif patch.name == "movingWall":
                ub.append(pf.fixed_value(jnp.asarray(
                    [1.0, 0.0, 0.0] + umesh_vec, mesh.v.dtype)))
                pb.append(pf.zero_gradient())
            else:
                ub.append(pf.fixed_value(jnp.asarray(
                    umesh_vec, mesh.v.dtype)))
                pb.append(pf.zero_gradient())
        U = vol_vector(mesh, jnp.asarray(umesh_vec, mesh.v.dtype),
                       name="U", dims=dimVelocity, bcs=tuple(ub))
        p = vol_scalar(mesh, 0.0, name="p",
                       dims=DimensionSet.of(0, 2, -2), bcs=tuple(pb))
        return pm, mesh, U, p

    # static reference
    pm_s, mesh_s, U_s, p_s = build(np.zeros(3))
    cfg_s = piso.PisoConfig(nu=0.01, n_correctors=2)
    st_s = piso.initial_state(mesh_s, U_s, p_s, project=False)
    step_s = jax.jit(lambda s, d: piso.piso_step(mesh_s, s, d, cfg_s))
    dt = jnp.asarray(0.002, mesh_s.v.dtype)
    for _ in range(40):
        st_s, _ = step_s(st_s, dt)

    # translating mesh (ALE)
    pm_m, mesh_m, U_m, p_m = build(V0)
    pts_fn, umesh_fn = moving.linear_motion(V0)
    cfg_m = pimpledym.DyMConfig(nu=0.01, n_correctors=2,
                                pts_fn=pts_fn, umesh_fn=umesh_fn)
    st_m = pimpledym.initial_state(pm_m, mesh_m, U_m, p_m,
                               umesh_fn=umesh_fn)
    step_m = jax.jit(
        lambda s, d: pimpledym.pimpledym_step(mesh_m, s, d, cfg_m))
    for _ in range(40):
        st_m, diag = step_m(st_m, dt)

    Urel = np.asarray(st_m["U"].data) - V0
    Ustat = np.asarray(st_s["U"].data)
    assert np.isfinite(Urel).all()
    err = np.abs(Urel - Ustat).max()
    assert err < 0.02, err   # lid speed 1.0
    # the mesh actually moved
    assert float(st_m["t"]) > 0.0
    assert np.allclose(np.asarray(st_m["points"])[:, 0].min(),
                       float(st_m["t"]) * V0[0], atol=1e-5)
