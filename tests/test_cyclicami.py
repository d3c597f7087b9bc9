"""cyclicAMI — non-conformal coupled interfaces (reference:
src/meshTools/AMIInterpolation/, fvPatchFields/constraint/cyclicAMI/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimless
from foamtpu.core.fields import VolField, vol_scalar
from foamtpu.mesh import blockmesh, to_device
from foamtpu.ops import fvm
from foamtpu.solvers import linear

TWO_BLOCK = """
convertToMeters 1;
vertices (
  (0 0 0) (0.5 0 0) (0.5 1 0) (0 1 0)
  (0 0 0.1) (0.5 0 0.1) (0.5 1 0.1) (0 1 0.1)
  (0.5 0 0) (1 0 0) (1 1 0) (0.5 1 0)
  (0.5 0 0.1) (1 0 0.1) (1 1 0.1) (0.5 1 0.1)
);
blocks (
  hex (0 1 2 3 4 5 6 7)     (8 8 1)  simpleGrading (1 1 1)
  hex (8 9 10 11 12 13 14 15) (8 12 1) simpleGrading (1 1 1)
);
boundary (
  leftIn   { type patch; faces ((0 4 7 3)); }
  rightOut { type patch; faces ((9 10 14 13)); }
  AMIl     { type cyclicAMI; neighbourPatch AMIr; faces ((1 2 6 5)); }
  AMIr     { type cyclicAMI; neighbourPatch AMIl; faces ((8 12 15 11)); }
  walls    { type wall; faces ((1 5 4 0) (3 7 6 2) (8 11 10 9)
                               (12 13 14 15)); }
  frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)
                                    (8 9 10 11) (12 15 14 13)); }
);
"""


def _mesh():
    return to_device(blockmesh.generate(parse_string(TWO_BLOCK)))


def test_ami_weights_built():
    mesh = _mesh()
    assert mesh.has_ami
    nE = mesh.ami_entry_w.shape[0]
    assert nE > 0
    # weights normalise to 1 per receiving face
    nbf = mesh.n_faces - mesh.n_internal_faces
    wsum = np.zeros(nbf)
    np.add.at(wsum, np.asarray(mesh.ami_entry_face),
              np.asarray(mesh.ami_entry_w))
    ami = np.asarray(mesh.ami_mask) > 0
    assert np.allclose(wsum[ami], 1.0, atol=1e-12)
    assert (wsum[~ami] == 0).all()
    # 8 faces on one side receive from 12 on the other and vice versa:
    # non-conformal => some faces have >1 source
    counts = np.bincount(np.asarray(mesh.ami_entry_face), minlength=nbf)
    assert counts[ami].max() >= 2


def test_ami_diffusion_linear_profile():
    """Steady diffusion T(0)=0, T(1)=1 across the non-conformal AMI:
    the solution is T = x regardless of the interface; the implicit
    coupling must reproduce it and conserve the flux across the AMI."""
    mesh = _mesh()
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.name == "leftIn":
            bcs.append(pf.fixed_value(0.0))
        elif p.name == "rightOut":
            bcs.append(pf.fixed_value(1.0))
        elif p.type == "cyclicAMI":
            bcs.append(pf.PatchField(kind="cyclicAMI", vfrac=0.0))
        else:
            bcs.append(pf.zero_gradient())
    T = vol_scalar(mesh, 0.0, name="T", bcs=tuple(bcs))

    eqn = -fvm.laplacian(mesh, jnp.asarray(1.0, mesh.v.dtype), T,
                         corrected=False)
    assert eqn.ami_coef is not None
    x, perf = linear.solve(mesh, eqn, T.data, {
        "solver": "PBiCGStab", "preconditioner": "polynomial",
        "tolerance": 1e-10, "relTol": 0.0, "maxIter": 2000})
    c = np.asarray(mesh.c)
    xv = np.asarray(x)
    assert np.abs(xv - c[:, 0]).max() < 2e-3, \
        f"max dev {np.abs(xv - c[:, 0]).max()}"
    # flux conservation across the AMI: total flux through AMIl equals
    # the inlet flux (1D solution => dT/dx=1, area = 0.1)
    Tf = VolField(data=jnp.asarray(xv), bcs=T.bcs, name="T")
    F = eqn.replace_fields(source=eqn.source).flux(
        mesh, jnp.asarray(xv))
    F = np.asarray(F)
    pl = mesh.patch("AMIl")
    pin = mesh.patch("leftIn")
    flux_ami = F[pl.slice].sum()
    flux_in = F[pin.slice].sum()
    assert abs(abs(flux_ami) - abs(flux_in)) < 5e-3 * abs(flux_in) + 1e-8


ANNULUS = """
convertToMeters 1;
vertices (
  (0.05 0 0) (0 0.05 0) (-0.05 0 0) (0 -0.05 0)
  (0.1 0 0) (0 0.1 0) (-0.1 0 0) (0 -0.1 0)
  (0.05 0 0.01) (0 0.05 0.01) (-0.05 0 0.01) (0 -0.05 0.01)
  (0.1 0 0.01) (0 0.1 0.01) (-0.1 0 0.01) (0 -0.1 0.01)
  (0.1001 0 0) (0 0.1001 0) (-0.1001 0 0) (0 -0.1001 0)
  (0.2 0 0) (0 0.2 0) (-0.2 0 0) (0 -0.2 0)
  (0.1001 0 0.01) (0 0.1001 0.01) (-0.1001 0 0.01) (0 -0.1001 0.01)
  (0.2 0 0.01) (0 0.2 0.01) (-0.2 0 0.01) (0 -0.2 0.01)
);
blocks (
  hex (0 1 5 4 8 9 13 12)   ({nt_r} 3 1) simpleGrading (1 1 1)
  hex (1 2 6 5 9 10 14 13)  ({nt_r} 3 1) simpleGrading (1 1 1)
  hex (2 3 7 6 10 11 15 14) ({nt_r} 3 1) simpleGrading (1 1 1)
  hex (3 0 4 7 11 8 12 15)  ({nt_r} 3 1) simpleGrading (1 1 1)
  hex (16 17 21 20 24 25 29 28) ({nt_s} 3 1) simpleGrading (1 1 1)
  hex (17 18 22 21 25 26 30 29) ({nt_s} 3 1) simpleGrading (1 1 1)
  hex (18 19 23 22 26 27 31 30) ({nt_s} 3 1) simpleGrading (1 1 1)
  hex (19 16 20 23 27 24 28 31) ({nt_s} 3 1) simpleGrading (1 1 1)
);
edges (
  arc 0 1 (0.035355 0.035355 0)  arc 1 2 (-0.035355 0.035355 0)
  arc 2 3 (-0.035355 -0.035355 0)  arc 3 0 (0.035355 -0.035355 0)
  arc 4 5 (0.070711 0.070711 0)  arc 5 6 (-0.070711 0.070711 0)
  arc 6 7 (-0.070711 -0.070711 0)  arc 7 4 (0.070711 -0.070711 0)
  arc 8 9 (0.035355 0.035355 0.01)  arc 9 10 (-0.035355 0.035355 0.01)
  arc 10 11 (-0.035355 -0.035355 0.01)  arc 11 8 (0.035355 -0.035355 0.01)
  arc 12 13 (0.070711 0.070711 0.01)  arc 13 14 (-0.070711 0.070711 0.01)
  arc 14 15 (-0.070711 -0.070711 0.01)  arc 15 12 (0.070711 -0.070711 0.01)
  arc 16 17 (0.070782 0.070782 0)  arc 17 18 (-0.070782 0.070782 0)
  arc 18 19 (-0.070782 -0.070782 0)  arc 19 16 (0.070782 -0.070782 0)
  arc 20 21 (0.141421 0.141421 0)  arc 21 22 (-0.141421 0.141421 0)
  arc 22 23 (-0.141421 -0.141421 0)  arc 23 20 (0.141421 -0.141421 0)
  arc 24 25 (0.070782 0.070782 0.01)  arc 25 26 (-0.070782 0.070782 0.01)
  arc 26 27 (-0.070782 -0.070782 0.01)  arc 27 24 (0.070782 -0.070782 0.01)
  arc 28 29 (0.141421 0.141421 0.01)  arc 29 30 (-0.141421 0.141421 0.01)
  arc 30 31 (-0.141421 -0.141421 0.01)  arc 31 28 (0.141421 -0.141421 0.01)
);
boundary (
  innerWall { type wall; faces ((0 8 9 1) (1 9 10 2) (2 10 11 3) (3 11 8 0)); }
  AMIrotor  { type cyclicAMI; neighbourPatch AMIstator;
              transform rotational; rotationAxis (0 0 1);
              rotationCentre (0 0 0);
              faces ((4 5 13 12) (5 6 14 13) (6 7 15 14) (7 4 12 15)); }
  AMIstator { type cyclicAMI; neighbourPatch AMIrotor;
              transform rotational; rotationAxis (0 0 1);
              rotationCentre (0 0 0);
              faces ((16 24 25 17) (17 25 26 18) (18 26 27 19) (19 27 24 16)); }
  outerWall { type wall; faces ((20 21 29 28) (21 22 30 29) (22 23 31 30) (23 20 28 31)); }
  frontAndBack { type empty; faces ((0 1 5 4) (1 2 6 5) (2 3 7 6) (3 0 4 7)
                                    (8 12 13 9) (9 13 14 10) (10 14 15 11) (11 15 12 8)
                                    (16 17 21 20) (17 18 22 21) (18 19 23 22) (19 16 20 23)
                                    (24 28 29 25) (25 29 30 26) (26 30 31 27) (27 31 28 24)); }
);
"""


def _annulus_mesh():
    d = ANNULUS.replace("{nt_r}", "6").replace("{nt_s}", "4")
    return to_device(blockmesh.generate(parse_string(d)))


def test_rotational_ami_radial_diffusion():
    """Rotor (24 faces) / stator (16 faces) annuli coupled by a
    rotational cyclicAMI ring: steady radial conduction T(r0)=0,
    T(r2)=1 must reproduce the ln(r) profile continuously across the
    non-conformal interface (the mixer-proxy geometry)."""
    mesh = _annulus_mesh()
    assert mesh.has_ami
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.name == "innerWall":
            bcs.append(pf.fixed_value(0.0))
        elif p.name == "outerWall":
            bcs.append(pf.fixed_value(1.0))
        elif p.type == "cyclicAMI":
            bcs.append(pf.PatchField(kind="cyclicAMI", vfrac=0.0))
        else:
            bcs.append(pf.zero_gradient())
    T = vol_scalar(mesh, 0.0, name="T", bcs=tuple(bcs))
    # orthogonal form: the radial direction (through the AMI) is
    # orthogonal on this mesh; the deferred non-ortho correction needs
    # the solvers' Picard loop and is exercised by the solver tests
    eqn = -fvm.laplacian(mesh, jnp.asarray(1.0, mesh.v.dtype), T,
                         corrected=False)
    x, perf = linear.solve(mesh, eqn, T.data, {
        "solver": "PBiCGStab", "preconditioner": "polynomial",
        "tolerance": 1e-10, "relTol": 0.0, "maxIter": 3000})
    c = np.asarray(mesh.c)
    r = np.linalg.norm(c[:, :2], axis=1)
    exact = np.log(r / 0.05) / np.log(0.2 / 0.05)
    xv = np.asarray(x)
    # coarse mesh: a few % discretisation error, but NO jump at the AMI
    assert np.abs(xv - exact).max() < 0.04
    rotor = r < 0.1
    near_lo = rotor & (r > 0.085)
    near_hi = (~rotor) & (r < 0.12)
    # mean jump across the interface stays at discretisation level
    assert abs(xv[near_lo].mean() - exact[near_lo].mean()) < 0.03
    assert abs(xv[near_hi].mean() - exact[near_hi].mean()) < 0.03


def test_ami_mixer_flow_with_mrf():
    """Mixer proxy: rotating inner zone (MRF, cylinder selection up to
    the AMI radius) driving flow, coupled to the static outer annulus
    through the rotational cyclicAMI. One PISO step set must run with
    bounded continuity and transfer swirl across the interface."""
    from foamtpu.core.dictionary import FoamDict
    from foamtpu.core.dimensions import dimVelocity
    from foamtpu.core.fields import vol_vector
    from foamtpu.models import mrf as mrf_mod
    from foamtpu.solvers import piso

    mesh = _annulus_mesh()
    zones = mrf_mod.from_dict(mesh, FoamDict([
        ("rotor", FoamDict([
            ("selectionMode", "cylinder"),
            ("origin", (0.0, 0.0, 0.0)),
            ("axis", (0.0, 0.0, 1.0)),
            ("radius", 0.1),
            ("omega", 10.0),
        ]))]))
    assert bool(zones)

    ubcs, pbcs = [], []
    for p in mesh.patches:
        if p.type == "empty":
            ubcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            pbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.type == "cyclicAMI":
            ubcs.append(pf.PatchField(kind="cyclicAMI", vfrac=0.0))
            pbcs.append(pf.PatchField(kind="cyclicAMI", vfrac=0.0))
        else:
            ubcs.append(pf.fixed_value(jnp.zeros(3)))
            pbcs.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(ubcs))
    pfld = vol_scalar(mesh, 0.0, name="p",
                      dims=DimensionSet.of(0, 2, -2), bcs=tuple(pbcs))
    cfg = piso.PisoConfig(
        nu=2e-3, n_correctors=2, mrf=zones,
        p_controls={"solver": "PBiCGStab",
                    "preconditioner": "polynomial",
                    "tolerance": 1e-8, "relTol": 0.0, "maxIter": 2000},
        u_controls={"solver": "PBiCGStab", "tolerance": 1e-8,
                    "relTol": 0.0, "maxIter": 500})
    # rotating-zone walls take U = omega x r (the rotor surface)
    U = zones.correct_boundary_velocity(mesh, U)
    state = piso.initial_state(mesh, U, pfld)
    state = mrf_mod.make_relative_state(mesh, zones, state)
    step = piso.make_step(mesh, cfg)
    dt = jnp.asarray(5e-4, mesh.v.dtype)
    diag = None
    for _ in range(10):
        state, diag = step(state, dt)
    u = np.asarray(state["U"].data)
    assert np.isfinite(u).all()
    assert float(diag["continuity"]) < 1e-4
    # swirl crossed the AMI: tangential speed in the stator is nonzero
    c = np.asarray(mesh.c)
    r = np.linalg.norm(c[:, :2], axis=1)
    stator = r > 0.1
    that = np.stack([-c[:, 1], c[:, 0]], axis=1)
    that /= np.linalg.norm(that, axis=1, keepdims=True)
    ut = (u[:, :2] * that).sum(axis=1)
    assert np.abs(ut[stator]).max() > 1e-4
