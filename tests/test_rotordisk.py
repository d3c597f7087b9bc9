"""rotorDiskSource — blade-element momentum rotor fvOption.

Reference oracle: src/fvOptions/sources/derived/rotorDiskSource/ with
trimModel fixed. At zero inflow the inflow angle is zero, so the
zone-integrated axial force must equal the blade-element integral
  T = -nB * 0.5 * omega^2 * c * cl(theta) * (r2^3 - r1^3) / 3
and the axis torque the drag integral
  tau = nB * 0.5 * omega^2 * c * cd * (r2^4 - r1^4) / 4
(kinematic units; the Cartesian-annulus quadrature gives ~10%)."""

import numpy as np
import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import FoamDict, parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models import fvoptions
from foamtpu.ops.matrix import zero_matrix

BOX = """
convertToMeters 1;
vertices
(
    (-1 -1 0) (1 -1 0) (1 1 0) (-1 1 0)
    (-1 -1 0.2) (1 -1 0.2) (1 1 0.2) (-1 1 0.2)
);
blocks ( hex (0 1 2 3 4 5 6 7) (32 32 2) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((0 4 7 3) (2 6 5 1) (3 7 6 2)
                              (1 5 4 0) (0 3 2 1) (4 5 6 7)); }
);
"""

RPM = 600.0
OMEGA = RPM * 2.0 * np.pi / 60.0
R1, R2 = 0.2, 0.8
CHORD = 0.1
TWIST = 8.0                      # deg
CL_PER_RAD = 5.0                 # cl table slope
CD0 = 0.02


def _rotor_spec(**over):
    d = FoamDict([
        ("type", "rotorDiskSource"),
        ("selectionMode", "all"),
        ("fields", ["U"]),
        ("rpm", RPM), ("nBlades", 3), ("tipEffect", 1.0),
        ("origin", [(0.0, 0.0, 0.1)]), ("axis", [(0.0, 0.0, 1.0)]),
        ("blade", FoamDict([("data", [
            [R1, (TWIST, CHORD)], [R2, (TWIST, CHORD)]])])),
        ("profiles", FoamDict([("profile1", FoamDict([
            ("type", "lookup"),
            ("data", [[-90.0, (CD0, -CL_PER_RAD * np.pi / 2)],
                      [90.0, (CD0, CL_PER_RAD * np.pi / 2)]]),
        ]))])),
    ])
    d.update(over)
    return d


def _mesh_U(u0=(0.0, 0.0, 0.0)):
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    bcs = tuple(pf.fixed_value(jnp.zeros(3)) for _ in mesh.patches)
    U = vol_vector(mesh, jnp.asarray(u0), name="U", dims=dimVelocity,
                   bcs=bcs)
    return mesh, U


def _forces(mesh, U, spec):
    opts = fvoptions.from_dict(mesh, FoamDict([("rotor", spec)]))
    m0 = zero_matrix(mesh, 3, dims=DimensionSet.of(0, 4, -2))
    eqn = opts.add_to(mesh, m0, "U", U, U=U)
    return np.asarray(eqn.source)        # volume-integrated force/rho


def test_hover_thrust_and_torque_match_blade_element_integrals():
    mesh, U = _mesh_U()
    f = _forces(mesh, U, _rotor_spec())
    cl = CL_PER_RAD * np.deg2rad(TWIST)
    T_ref = -3 * 0.5 * OMEGA ** 2 * CHORD * cl * (R2 ** 3 - R1 ** 3) / 3
    Tz = f[:, 2].sum()
    assert Tz < 0.0                       # pushes fluid along -axis
    np.testing.assert_allclose(Tz, T_ref, rtol=0.10)
    # axis torque from profile drag, swirl in the rotation direction
    c = np.asarray(mesh.c) - np.asarray([0.0, 0.0, 0.1])
    tau = np.sum(np.cross(c, f)[:, 2])
    tau_ref = 3 * 0.5 * OMEGA ** 2 * CHORD * CD0 * (R2 ** 4 - R1 ** 4) / 4
    np.testing.assert_allclose(tau, tau_ref, rtol=0.12)
    # lateral force cancels by symmetry
    assert abs(f[:, 0].sum()) < 0.02 * abs(Tz)
    assert abs(f[:, 1].sum()) < 0.02 * abs(Tz)


def test_climb_inflow_reduces_aoa_and_thrust():
    """Axial inflow ALONG the thrust direction (-axis, the rotor's
    downwash direction) tilts the relative wind and reduces the
    effective angle of attack, hence |thrust| drops — the classic
    climb/inflow derating."""
    mesh, U0 = _mesh_U()
    f0 = _forces(mesh, U0, _rotor_spec())
    mesh2, Uc = _mesh_U((0.0, 0.0, -3.0))
    fc = _forces(mesh2, Uc, _rotor_spec())
    assert abs(fc[:, 2].sum()) < abs(f0[:, 2].sum())
    assert np.isfinite(fc).all()


def test_blade_range_masks_cells():
    mesh, U = _mesh_U()
    f = _forces(mesh, U, _rotor_spec())
    c = np.asarray(mesh.c)
    r = np.linalg.norm(c[:, :2], axis=1)
    outside = (r < R1 - 0.06) | (r > R2 + 0.06)
    assert np.abs(f[outside]).max() == 0.0
