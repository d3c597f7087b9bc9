"""Derived BC batch 4 (bc/derived4.py; reference:
fvPatchFields/derived/{maxwellSlipU,smoluchowskiJumpT,fanPressure,
syringePressure,pressureInletOutletParSlipVelocity},
rhoCentralFoam/BCs/fixedRho, twoPhaseInterfaceProperties/
alphaContactAngle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.bc import factory, patchfields as pf
from foamtpu.core.dictionary import parse_string


def _mesh2d():
    """Tiny cavity mesh on device for patch geometry."""
    from foamtpu.apps.cases import make_cavity

    mesh, state, cfg = make_cavity(4)
    return mesh


def _patch(mesh, name=None):
    for p in mesh.patches:
        if name is None or p.name == name:
            if p.size > 0:
                return p
    raise KeyError(name)


def test_contact_angle_rotates_boundary_normals():
    """After correction, nHat.n_wall = cos(theta0) on the wall patch
    (reference: interfaceProperties::correctContactAngle)."""
    from foamtpu.core.fields import vol_scalar
    from foamtpu.models.interface import _correct_contact_angle

    mesh = _mesh2d()
    p = _patch(mesh, "movingWall")
    alpha = vol_scalar(mesh, 0.5, name="alpha")
    bcs = list(alpha.bcs)
    i = list(m.name for m in mesh.patches).index("movingWall")
    theta = np.radians(45.0)
    bcs[i] = pf.make("alphaContactAngle", ref_grad=0.0, vfrac=0.0,
                     theta0=float(theta))
    alpha = alpha.replace_bcs(tuple(bcs)) if hasattr(
        alpha, "replace_bcs") else alpha.replace(bcs=tuple(bcs)) \
        if hasattr(alpha, "replace") else alpha._replace(
        bcs=tuple(bcs))
    # interface normal along +x everywhere (interface parallel to wall
    # normal) — after correction the wall faces must satisfy the angle
    nhat = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                            (mesh.n_faces, 3))
    out = _correct_contact_angle(mesh, alpha, jnp.array(nhat))
    sl = p.slice
    nf = np.asarray(mesh.sf[sl]) / np.asarray(
        mesh.mag_sf[sl])[:, None]
    dots = np.einsum("fd,fd->f", np.asarray(out[sl]), nf)
    assert np.allclose(dots, np.cos(theta), atol=1e-5)
    # other faces untouched
    assert np.allclose(np.asarray(out[:mesh.n_internal_faces]),
                       [1.0, 0.0, 0.0], atol=1e-7)


def test_contact_angle_parse():
    d = parse_string("type constantAlphaContactAngle; theta0 60; "
                     "limit gradient; value uniform 0;")

    class P:
        name = "w"
        size = 2
        slice = slice(0, 2)

    bc = factory.from_dict(d, P(), 0, np.float32)
    assert bc.kind == "alphaContactAngle"
    assert abs(bc.opt("theta0") - np.radians(60)) < 1e-12
    d2 = parse_string("type dynamicAlphaContactAngle; theta0 90; "
                      "uTheta 1; thetaA 120; thetaR 60; "
                      "value uniform 0;")
    bc2 = factory.from_dict(d2, P(), 0, np.float32)
    assert bc2.kind == "alphaContactAngle"
    assert abs(bc2.opt("thetaA") - np.radians(120)) < 1e-12


def test_maxwell_slip_u():
    mesh = _mesh2d()
    p = _patch(mesh, "movingWall")
    ui = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                          (p.size, 3))
    # lambda -> 0: no-slip (value -> Uwall)
    bc0 = pf.make("maxwellSlipU", ref_value=0.0, vfrac=1.0,
                  **{"lambda": 0.0, "accommodationCoeff": 1.0,
                     "Uwall": (0.0, 0.0, 0.0)})
    out0 = pf.update(bc0, mesh, p, ui)
    assert np.allclose(np.asarray(out0.ref_value), 0.0, atol=1e-7)
    # lambda huge: full slip (tangential value -> interior tangential)
    bc1 = pf.make("maxwellSlipU", ref_value=0.0, vfrac=1.0,
                  **{"lambda": 1e9, "accommodationCoeff": 1.0,
                     "Uwall": (0.0, 0.0, 0.0)})
    out1 = pf.update(bc1, mesh, p, ui)
    n = np.asarray(mesh.sf[p.slice]) / np.asarray(
        mesh.mag_sf[p.slice])[:, None]
    ut = np.asarray(ui) - np.einsum("fd,fd->f", np.asarray(ui),
                                    n)[:, None] * n
    assert np.allclose(np.asarray(out1.ref_value), ut, atol=1e-5)


def test_smoluchowski_jump_t():
    mesh = _mesh2d()
    p = _patch(mesh, "movingWall")
    Ti = jnp.full((p.size,), 400.0)
    bc0 = pf.make("smoluchowskiJumpT", ref_value=300.0, vfrac=1.0,
                  **{"lambda": 0.0, "Twall": 300.0})
    out0 = pf.update(bc0, mesh, p, Ti)
    assert np.allclose(np.asarray(out0.vfrac), 1.0)   # T = Twall
    bc1 = pf.make("smoluchowskiJumpT", ref_value=300.0, vfrac=1.0,
                  **{"lambda": 1e9, "Twall": 300.0})
    out1 = pf.update(bc1, mesh, p, Ti)
    assert np.asarray(out1.vfrac).max() < 1e-6        # zeroGradient


def test_fixed_rho():
    mesh = _mesh2d()
    p = _patch(mesh, "movingWall")
    rho_i = jnp.full((p.size,), 1.0)
    bc = pf.make("fixedRho", ref_value=1.0, vfrac=1.0, psi=1e-5)
    p_b = jnp.full((mesh.n_faces,), 2e5)
    out = pf.update(bc, mesh, p, rho_i, p_b=p_b)
    assert np.allclose(np.asarray(out.ref_value), 2.0, rtol=1e-6)


def test_fan_pressure():
    from foamtpu.bc.derived3 import _Frozen

    mesh = _mesh2d()
    p = _patch(mesh, "movingWall")
    pi = jnp.zeros((p.size,))
    curve = _Frozen(np.asarray([[0.0, 10.0], [1.0, 0.0]]))
    bc = pf.make("fanPressure", ref_value=0.0, vfrac=1.0, p0=5.0,
                 direction="in", fanCurve=curve)
    phi = jnp.zeros((mesh.n_faces,))          # zero flow: full head
    out = pf.update(bc, mesh, p, pi, phi=phi)
    assert np.allclose(np.asarray(out.ref_value), 15.0, rtol=1e-6)
    # flow = 1 (into domain): head drops to 0
    area = float(np.asarray(mesh.mag_sf[p.slice]).sum())
    phi1 = jnp.zeros((mesh.n_faces,)).at[p.slice].set(
        -1.0 * jnp.asarray(np.asarray(mesh.mag_sf[p.slice]) / area))
    out1 = pf.update(bc, mesh, p, pi, phi=phi1)
    assert np.allclose(np.asarray(out1.ref_value), 5.0, atol=1e-5)


def test_syringe_pressure_monotone():
    mesh = _mesh2d()
    p = _patch(mesh, "movingWall")
    pi = jnp.zeros((p.size,))
    bc = pf.make("syringePressure", ref_value=0.0, vfrac=1.0,
                 Ap=1e-4, Sp=0.1, VsI=1e-5, tas=0.0, tae=0.1,
                 tds=1e30, tde=2e30, psI=1e5)
    p1 = float(np.asarray(pf.update(bc, mesh, p, pi,
                                    t=0.2).ref_value)[0])
    p2 = float(np.asarray(pf.update(bc, mesh, p, pi,
                                    t=0.5).ref_value)[0])
    assert p2 > p1 > 1e5                # compression raises pressure


def test_pressure_io_par_slip():
    mesh = _mesh2d()
    p = _patch(mesh, "movingWall")
    ui = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.0]), (p.size, 3))
    bc = pf.make("pressureInletOutletParSlipVelocity", ref_value=0.0,
                 vfrac=0.0)
    phi = jnp.zeros((mesh.n_faces,)).at[p.slice].set(-0.1)
    out = pf.update(bc, mesh, p, jnp.array(ui), phi=phi)
    assert np.allclose(np.asarray(out.vfrac), 1.0)    # inflow
    n = np.asarray(mesh.sf[p.slice]) / np.asarray(
        mesh.mag_sf[p.slice])[:, None]
    v = np.asarray(out.ref_value)
    # tangential component preserved
    vt = v - np.einsum("fd,fd->f", v, n)[:, None] * n
    ut = np.asarray(ui) - np.einsum("fd,fd->f", np.asarray(ui),
                                    n)[:, None] * n
    assert np.allclose(vt, ut, atol=1e-5)
    # normal component equals the flux velocity
    vn = np.einsum("fd,fd->f", v, n)
    un = -0.1 / np.asarray(mesh.mag_sf[p.slice])
    assert np.allclose(vn, un, atol=1e-6)


def test_parse_batch4_kinds():
    class P:
        name = "w"
        size = 2
        slice = slice(0, 2)

    for src, kind in [
        ("type maxwellSlipU; accommodationCoeff 0.9; "
         "Uwall (0 0 0); value uniform (0 0 0);", "maxwellSlipU"),
        ("type smoluchowskiJumpT; accommodationCoeff 1; Twall 300; "
         "value uniform 300;", "smoluchowskiJumpT"),
        ("type fixedRho; value uniform 1;", "fixedRho"),
        ("type fanPressure; p0 0; fanCurve table ((0 10) (1 0)); "
         "direction in; value uniform 0;", "fanPressure"),
        ("type syringePressure; Ap 1e-4; Sp 0.1; VsI 1e-5; tas 0; "
         "tae 0.1; tds 0.2; tde 0.3; psI 1e5; value uniform 1e5;",
         "syringePressure"),
        ("type pressureInletOutletParSlipVelocity; "
         "value uniform (0 0 0);",
         "pressureInletOutletParSlipVelocity"),
    ]:
        rank = 1 if "(0 0 0)" in src else 0
        bc = factory.from_dict(parse_string(src), P(), rank,
                               np.float32)
        assert bc.kind == kind, (bc.kind, kind)
    # nutLowReWallFunction: the reference sets nut = 0 at the wall
    # (wall-resolved low-Re meshes) — a fixedValue-0, NOT the log-law
    # nutk wall function (ADVICE r3 #1)
    bc = factory.from_dict(
        parse_string("type nutLowReWallFunction; value uniform 0;"),
        P(), 0, np.float32)
    assert bc.kind == "fixedValue"
    assert float(np.max(np.abs(np.asarray(bc.ref_value)))) == 0.0


def test_dynamic_contact_angle_velocity_dependence():
    """theta = theta0 + (thetaA-thetaR)*tanh(uwall/uTheta): a wall
    moving against the interface direction advances the apparent
    angle, reversing it recedes; zero speed reproduces theta0
    (reference: dynamicAlphaContactAngleFvPatchScalarField::theta)."""
    from foamtpu.core.fields import vol_scalar, vol_vector
    from foamtpu.models.interface import _correct_contact_angle

    mesh = _mesh2d()
    p = _patch(mesh, "movingWall")
    i = list(m.name for m in mesh.patches).index("movingWall")
    theta0, thetaA, thetaR, uTheta = (np.radians(90.0),
                                      np.radians(120.0),
                                      np.radians(60.0), 0.5)
    alpha = vol_scalar(mesh, 0.5, name="alpha")
    bcs = list(alpha.bcs)
    bcs[i] = pf.make("alphaContactAngle", ref_grad=0.0, vfrac=0.0,
                     theta0=float(theta0), thetaA=float(thetaA),
                     thetaR=float(thetaR), uTheta=float(uTheta))
    alpha = alpha.replace(bcs=tuple(bcs))
    nhat0 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                             (mesh.n_faces, 3))

    def wall_dots(uwall_x):
        U = vol_vector(mesh, [0.0, 0.0, 0.0], name="U")
        ub = list(U.bcs)
        ub[i] = pf.make("fixedValue",
                        ref_value=jnp.asarray([uwall_x, 0.0, 0.0]))
        U = U.replace(bcs=tuple(ub))
        out = _correct_contact_angle(mesh, alpha, jnp.array(nhat0),
                                     U=U)
        sl = p.slice
        nf = np.asarray(mesh.sf[sl]) / np.asarray(
            mesh.mag_sf[sl])[:, None]
        return np.einsum("fd,fd->f", np.asarray(out[sl]), nf)

    # movingWall normal is +y (top); nWall (wall-projected interface
    # normal) is +x. U_rel = U_cell - U_wall = (-uwall_x, ...), so
    # uwall = -uwall_x and a wall moving +x gives theta < theta0.
    for ux in (0.0, 0.8, -0.8):
        uw = -ux
        th = theta0 + (thetaA - thetaR) * np.tanh(uw / uTheta)
        assert np.allclose(wall_dots(ux), np.cos(th), atol=2e-5), ux
