"""MRF zone tests (reference: src/finiteVolume/cfdTools/general/MRF/).

1. Solid-body relative flux: for U = omega x r the relative flux
   through every in-zone face is zero (exact on a uniform mesh).
2. MRF <-> stationary-frame equivalence on Taylor-Couette flow: a
   whole-domain rotating zone with the same absolute wall velocities
   converges to the same absolute U field, matching the analytic
   Couette profile.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import FoamDict, parse_string
from foamtpu.core.dimensions import dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models import mrf as mrf_mod
from foamtpu.ops import fvc, slot as slot_mod
from foamtpu.solvers import simple as simple_mod

R0, R1, OMEGA = 0.5, 1.0, 10.0


def _annulus_dict(nr=6, nt=16):
    def ring(r, z):
        return [(r * math.cos(a), r * math.sin(a), z)
                for a in (0, math.pi / 2, math.pi, 3 * math.pi / 2)]

    verts = []
    for z in (0.0, 0.1):
        verts += ring(R0, z) + ring(R1, z)
    vtxt = "\n".join(f"({v[0]:.9f} {v[1]:.9f} {v[2]:.9f})" for v in verts)
    angs = [0, math.pi / 2, math.pi, 3 * math.pi / 2, 2 * math.pi]

    def arcpt(r, a0, a1, z):
        am = (a0 + a1) / 2
        return f"({r*math.cos(am):.9f} {r*math.sin(am):.9f} {z})"

    blocks, edges = [], []
    for i in range(4):
        j = (i + 1) % 4
        blocks.append(f"hex ({i} {4+i} {4+j} {j} {8+i} {12+i} {12+j} {8+j})"
                      f" ({nr} {nt} 1) simpleGrading (1 1 1)")
        edges.append(f"arc {i} {j} {arcpt(R0, angs[i], angs[i+1], 0)}")
        edges.append(f"arc {4+i} {4+j} {arcpt(R1, angs[i], angs[i+1], 0)}")
        edges.append(f"arc {8+i} {8+j} {arcpt(R0, angs[i], angs[i+1], 0.1)}")
        edges.append(
            f"arc {12+i} {12+j} {arcpt(R1, angs[i], angs[i+1], 0.1)}")
    inner = " ".join(f"({i} {(i+1)%4} {8+(i+1)%4} {8+i})" for i in range(4))
    outer = " ".join(f"({4+i} {12+i} {12+(i+1)%4} {4+(i+1)%4})"
                     for i in range(4))
    fb = (" ".join(f"({i} {(i+1)%4} {4+(i+1)%4} {4+i})" for i in range(4))
          + " " + " ".join(f"({8+i} {8+(i+1)%4} {12+(i+1)%4} {12+i})"
                           for i in range(4)))
    return parse_string(f"""
convertToMeters 1;
vertices ( {vtxt} );
edges ( {chr(10).join(edges)} );
blocks ( {" ".join(blocks)} );
boundary (
  rotor {{ type wall; faces ( {inner} ); }}
  stator {{ type wall; faces ( {outer} ); }}
  frontAndBack {{ type empty; faces ( {fb} ); }}
);
""")


def test_relative_flux_solid_body():
    """phi_rel = phi_abs - (omega x r_f).Sf vanishes for U = omega x r
    (uniform box: linear interpolation is exact for linear fields)."""
    d = parse_string("""
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1) );
blocks ( hex (0 1 2 3 4 5 6 7) (10 10 1) simpleGrading (1 1 1) );
boundary (
  walls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2)); }
  frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
""")
    mesh = to_device(blockmesh.generate(d))
    zones = mrf_mod.from_dict(mesh, FoamDict({
        "zone1": FoamDict({"selectionMode": "all", "origin": [0.5, 0.5, 0],
                           "axis": [0, 0, 1], "omega": OMEGA})}))
    c = np.asarray(mesh.c) - [0.5, 0.5, 0.0]
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity)
    U = U.with_data(jnp.asarray(
        np.cross(np.broadcast_to([0, 0, OMEGA], c.shape), c),
        mesh.v.dtype))
    phi_abs = slot_mod.from_flat(mesh, fvc.flux(mesh, U))
    phi_rel = zones.make_relative(mesh, phi_abs)
    scale = OMEGA * 0.5 * 0.1 * 0.1  # |U| * face area
    assert float(jnp.max(jnp.abs(phi_rel.sv * mesh.st_valid))) < 1e-5 * scale
    # absolute->relative->absolute round-trips
    back = zones.make_absolute(mesh, phi_rel)
    assert float(jnp.max(jnp.abs(back.sv - phi_abs.sv))) < 1e-6 * scale


def _couette_bcs(mesh, rotor_u):
    ub, pb = [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            ub.append(pf.PatchField(kind="empty", vfrac=0.0))
            pb.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "rotor":
            ub.append(pf.fixed_value(rotor_u))
            pb.append(pf.zero_gradient())
        else:
            ub.append(pf.fixed_value(jnp.zeros(3)))
            pb.append(pf.zero_gradient())
    return tuple(ub), tuple(pb)


def _run_simple(mesh, cfg, U, p, iters=400):
    from foamtpu.solvers import piso as piso_mod

    state = piso_mod.initial_state(mesh, U, p, project=False)
    step = jax.jit(lambda s: simple_mod.simple_step(mesh, s, cfg))
    for _ in range(iters):
        state, diag = step(state)
    return state, diag


def test_mrf_taylor_couette_equivalence():
    """Whole-domain MRF zone vs stationary-frame solve of the same
    Taylor-Couette problem: identical absolute U (to discretisation
    error) and both matching the analytic profile."""
    mesh = to_device(blockmesh.generate(_annulus_dict()))
    nif = mesh.n_internal_faces
    cf = np.asarray(mesh.cf)
    nu = 0.05

    # --- stationary frame: rotor wall moves at omega x r -------------------
    rotor = next(p for p in mesh.patches if p.name == "rotor")
    r_rot = cf[rotor.start:rotor.start + rotor.size]
    u_rot = np.cross(np.broadcast_to([0, 0, OMEGA], r_rot.shape), r_rot)
    ub, pb = _couette_bcs(mesh, jnp.asarray(u_rot, mesh.v.dtype))
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=ub)
    p = vol_scalar(mesh, 0.0, name="p", bcs=pb)
    cfg = simple_mod.SimpleConfig(nu=nu, alpha_u=0.7, alpha_p=0.3)
    stA, _ = _run_simple(mesh, cfg, U, p)

    # --- MRF: rotating frame, rotor BC value set by the zone ---------------
    zones = mrf_mod.from_dict(mesh, FoamDict({
        "rotor": FoamDict({"selectionMode": "all",
                           "origin": [0.0, 0.0, 0.0],
                           "axis": [0, 0, 1], "omega": OMEGA,
                           "nonRotatingPatches": ["stator"]})}))
    ub2, pb2 = _couette_bcs(mesh, jnp.zeros(3))  # rotor starts at 0
    U2 = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                    bcs=ub2)
    U2 = zones.correct_boundary_velocity(mesh, U2)
    # BC now omega x r on the rotor
    rv = np.asarray(U2.bcs[0].ref_value)
    assert np.allclose(rv, u_rot, atol=1e-6)
    p2 = vol_scalar(mesh, 0.0, name="p", bcs=pb2)
    cfgM = cfg._replace(mrf=zones)
    from foamtpu.solvers import piso as piso_mod

    state2 = piso_mod.initial_state(mesh, U2, p2, project=False)
    state2 = mrf_mod.make_relative_state(mesh, zones, state2)
    step2 = jax.jit(lambda s: simple_mod.simple_step(mesh, s, cfgM))
    for _ in range(400):
        state2, diag2 = step2(state2)

    UA = np.asarray(stA["U"].data)
    UM = np.asarray(state2["U"].data)
    wall_speed = OMEGA * R0
    assert np.max(np.abs(UA - UM)) < 0.05 * wall_speed

    # analytic Couette: u_theta = A r + B / r
    A = -OMEGA * R0 ** 2 / (R1 ** 2 - R0 ** 2)
    B = OMEGA * R0 ** 2 * R1 ** 2 / (R1 ** 2 - R0 ** 2)
    c = np.asarray(mesh.c)
    r = np.hypot(c[:, 0], c[:, 1])
    that = np.stack([-c[:, 1] / r, c[:, 0] / r], axis=1)
    for Ud in (UA, UM):
        ut = np.einsum("cd,cd->c", Ud[:, :2], that)
        ut_exact = A * r + B / r
        err = np.abs(ut - ut_exact).max() / wall_speed
        # ~5% max error at the inner wall on the coarse 6x16/quadrant
        # mesh is discretisation error (curved B/r profile), not MRF
        assert err < 0.07, err
    # the MRF relative flux through rotor faces ~ -(omega x r).Sf:
    # absolute rotor-face flux (normal) is ~0
    phiM = np.asarray(state2["phi"])
    rotor_phi_rel = phiM[rotor.start:rotor.start + rotor.size]
    corr = zones.zones[0].face_corr[rotor.start:rotor.start + rotor.size]
    assert np.abs(rotor_phi_rel + corr).max() < 1e-3 * wall_speed * 0.01


def test_srf_simple_foam_solid_body_rotation(tmp_path):
    """SRFSimpleFoam (as whole-domain MRF on the absolute velocity):
    walls rotating with the frame drive the fluid to exact solid-body
    rotation (reference: SRFSimpleFoam + SRFProperties rpm)."""
    import os
    import shutil

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    dst = os.path.join(tmp_path, "srf")
    shutil.copytree(src, dst)
    with open(os.path.join(dst, "system", "controlDict")) as f:
        cd = f.read()
    cd = cd.replace("application     icoFoam;",
                    "application     SRFSimpleFoam;")
    cd = cd.replace("endTime         0.5;", "endTime         40;")
    cd = cd.replace("deltaT          0.005;", "deltaT          1;")
    with open(os.path.join(dst, "system", "controlDict"), "w") as f:
        f.write(cd)
    with open(os.path.join(dst, "system", "fvSolution"), "a") as f:
        f.write("""
SIMPLE { nNonOrthogonalCorrectors 0; pRefCell 0; pRefValue 0; }
relaxationFactors { U 0.7; p 0.3; }
""")
    with open(os.path.join(dst, "constant", "SRFProperties"), "w") as f:
        f.write("""FoamFile { version 2.0; format ascii; class dictionary; object SRFProperties; }
SRFModel        rpm;
origin          (0.05 0.05 0);
axis            (0 0 1);
rpmCoeffs { rpm 60; }
""")
    # walls all rotate WITH the frame -> Urel = 0 is the solution; the
    # moving lid fixedValue (1 0 0) would fight the frame, so zero it
    upath = os.path.join(dst, "0", "U")
    with open(upath) as f:
        u = f.read()
    u = u.replace("uniform (1 0 0)", "uniform (0 0 0)")
    with open(upath, "w") as f:
        f.write(u)
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", dst]) == 0
    case = run_case(dst, max_steps=40)
    U = np.asarray(case.final_state["U"].data)
    assert np.isfinite(U).all()
    # our SRF = whole-domain MRF solves the ABSOLUTE velocity
    # (documented deviation: the reference stores Urel): the converged
    # flow is exact solid-body rotation U = omega x (x - origin)
    c = np.asarray(case.mesh.c)
    omega = 2.0 * np.pi  # 60 rpm
    ue = np.stack([-omega * (c[:, 1] - 0.05),
                   omega * (c[:, 0] - 0.05),
                   np.zeros(c.shape[0])], axis=1)
    assert np.abs(U - ue).max() < 0.03
