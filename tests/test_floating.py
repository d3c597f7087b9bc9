"""Flow-coupled sixDoF rigid body (reference: sixDoFRigidBodyMotion
coupled into pimpleDyMFoam, the floatingObject pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models import sixdof
from foamtpu.solvers import floating

# tank with an interior square "body" hole (2D)
TANK = """
convertToMeters 1;
vertices
(
    (0 0 0)     (0.4 0 0)   (0.6 0 0)   (1 0 0)
    (0 0.4 0)   (0.4 0.4 0) (0.6 0.4 0) (1 0.4 0)
    (0 0.6 0)   (0.4 0.6 0) (0.6 0.6 0) (1 0.6 0)
    (0 1 0)     (0.4 1 0)   (0.6 1 0)   (1 1 0)
    (0 0 0.05)     (0.4 0 0.05)   (0.6 0 0.05)   (1 0 0.05)
    (0 0.4 0.05)   (0.4 0.4 0.05) (0.6 0.4 0.05) (1 0.4 0.05)
    (0 0.6 0.05)   (0.4 0.6 0.05) (0.6 0.6 0.05) (1 0.6 0.05)
    (0 1 0.05)     (0.4 1 0.05)   (0.6 1 0.05)   (1 1 0.05)
);
blocks
(
    hex (0 1 5 4 16 17 21 20) (6 6 1) simpleGrading (1 1 1)
    hex (1 2 6 5 17 18 22 21) (4 6 1) simpleGrading (1 1 1)
    hex (2 3 7 6 18 19 23 22) (6 6 1) simpleGrading (1 1 1)
    hex (4 5 9 8 20 21 25 24) (6 4 1) simpleGrading (1 1 1)
    hex (6 7 11 10 22 23 27 26) (6 4 1) simpleGrading (1 1 1)
    hex (8 9 13 12 24 25 29 28) (6 6 1) simpleGrading (1 1 1)
    hex (9 10 14 13 25 26 30 29) (4 6 1) simpleGrading (1 1 1)
    hex (10 11 15 14 26 27 31 30) (6 6 1) simpleGrading (1 1 1)
);
boundary
(
    body { type wall; faces ((5 6 22 21) (9 5 21 25)
                             (6 10 26 22) (10 9 25 26)); }
    walls { type wall; faces ((0 1 17 16) (1 2 18 17) (2 3 19 18)
                              (0 16 20 4) (4 20 24 8) (8 24 28 12)
                              (3 7 23 19) (7 11 27 23) (11 15 31 27)
                              (12 28 29 13) (13 29 30 14)
                              (14 30 31 15)); }
    frontAndBack { type empty; faces (
        (0 4 5 1) (1 5 6 2) (2 6 7 3) (4 8 9 5) (6 10 11 7)
        (8 12 13 9) (9 13 14 10) (10 14 15 11)
        (16 17 21 20) (17 18 22 21) (18 19 23 22) (20 21 25 24)
        (22 23 27 26) (24 25 29 28) (25 26 30 29) (26 27 31 30)); }
);
"""


def _setup(v0=(0.05, 0.0, 0.0), springs=()):
    pm = blockmesh.generate(parse_string(TANK))
    mesh = to_device(pm)
    body_idx = [i for i, p in enumerate(mesh.patches)
                if p.name == "body"][0]
    bcfg = sixdof.RigidBodyConfig(mass=5.0, I_body=(0.1, 0.1, 0.1),
                                  springs=springs)
    cfg = floating.FloatingConfig(
        nu=1e-3, body=bcfg, body_patch=body_idx, x0=(0.5, 0.5, 0.025),
        r_inner=0.18, r_outer=0.38, rho_ref=1000.0)
    ub, pb = [], []
    for pt in mesh.patches:
        if pt.type == "empty":
            ub.append(pf.PatchField(kind="empty", vfrac=0.0))
            pb.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            ub.append(pf.fixed_value(jnp.zeros(3)))
            pb.append(pf.zero_gradient())
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U", bcs=tuple(ub))
    p = vol_scalar(mesh, 0.0, name="p", bcs=tuple(pb))
    body = sixdof.RigidBodyState(
        x=jnp.asarray([0.5, 0.5, 0.025], mesh.v.dtype),
        q=jnp.asarray([1.0, 0.0, 0.0, 0.0], mesh.v.dtype),
        v=jnp.asarray(v0, mesh.v.dtype),
        L=jnp.zeros(3, mesh.v.dtype))
    state = floating.initial_state(pm, mesh, U, p, cfg, body=body)
    return mesh, state, cfg


def test_moving_body_drags_fluid_and_decelerates():
    """A body coasting through still viscous fluid: the mesh follows
    it, the fluid around it is set in motion (no-slip momentum
    exchange), the flow force opposes the motion, and cell volumes
    stay positive."""
    mesh, state, cfg = _setup(v0=(0.05, 0.0, 0.0))
    step = floating.make_step(mesh, cfg)
    x0 = float(state["body"].x[0])
    for _ in range(15):
        state, diag = step(state, jnp.asarray(0.01, mesh.v.dtype))
    # body moved
    assert float(state["body"].x[0]) > x0 + 1e-4
    # mesh stayed valid through the deformation
    assert float(diag["v_min"]) > 0.0
    # fluid entrained: nonzero velocity near the body
    assert float(jnp.max(jnp.abs(state["U"].data))) > 1e-4
    # drag force opposes the +x motion
    assert float(diag["force"][0]) < 0.0


def test_spring_mounted_body_oscillates():
    """linearSpring restraint: the displaced body oscillates about the
    anchor instead of drifting away."""
    springs = (((0.5, 0.5, 0.025), (0.0, 0.0, 0.0), 400.0, 0.0, 0.0),)
    mesh, state, cfg = _setup(v0=(0.08, 0.0, 0.0), springs=springs)
    step = floating.make_step(mesh, cfg)
    xs = []
    for _ in range(60):
        state, diag = step(state, jnp.asarray(0.01, mesh.v.dtype))
        xs.append(float(state["body"].x[0]) - 0.5)
    xs = np.asarray(xs)
    # displacement changed sign: oscillation, with bounded amplitude
    assert xs.max() > 1e-4
    assert xs.min() < -1e-5
    assert np.abs(xs).max() < 0.12
    assert float(diag["v_min"]) > 0.0


def test_pimpledym_sixdof_case(tmp_path):
    """pimpleDyMFoam routes dynamicMeshDict's sixDoFRigidBodyMotion to
    the coupled solver; the spring-restrained body's centre of mass
    responds to its initial impulse-free state under the flow."""
    import os

    case = os.path.join(str(tmp_path), "floatingBox")
    os.makedirs(os.path.join(case, "system"), exist_ok=True)
    os.makedirs(os.path.join(case, "constant", "polyMesh"),
                exist_ok=True)
    def w(rel, body, cls="dictionary"):
        path = os.path.join(case, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("FoamFile { version 2.0; format ascii; class "
                    + cls + "; object "
                    + os.path.basename(rel) + "; }\n" + body)

    w("constant/polyMesh/blockMeshDict", TANK)
    w("system/controlDict", """
application     pimpleDyMFoam;
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         0.05;
deltaT          0.01;
writeControl    timeStep;
writeInterval   100;
writeFormat     ascii;
""")
    w("system/fvSchemes", """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
""")
    w("system/fvSolution", """
solvers
{
    p { solver PCG; preconditioner polynomial; tolerance 1e-7; relTol 0.01; }
    U { solver PBiCGStab; tolerance 1e-6; relTol 0.1; maxIter 200; }
}
PIMPLE { nCorrectors 2; }
""")
    w("constant/transportProperties", "nu nu [0 2 -1 0 0 0 0] 1e-3;")
    w("constant/dynamicMeshDict", """
motionSolver sixDoFRigidBodyMotion;
sixDoFRigidBodyMotionCoeffs
{
    patch body;
    mass 5.0;
    momentOfInertia (0.1 0.1 0.1);
    centreOfMass (0.5 0.5 0.025);
    innerDistance 0.18;
    outerDistance 0.38;
    rhoInf 1000;
    restraints
    {
        spring
        {
            sixDoFRigidBodyMotionRestraint linearSpring;
            anchor (0.5 0.5 0.025);
            refAttachmentPt (0 0 0);
            stiffness 400;
            damping 5;
            restLength 0;
        }
    }
}
""")
    w("0/U", """
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0 0 0);
boundaryField
{
    body { type fixedValue; value uniform (0 0 0); }
    walls { type fixedValue; value uniform (0 0 0); }
    frontAndBack { type empty; }
}
""", cls="volVectorField")
    w("0/p", """
dimensions [0 2 -2 0 0 0 0];
internalField uniform 0;
boundaryField
{
    body { type zeroGradient; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""", cls="volScalarField")
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["pimpleDyMFoam"](c, max_steps=3)
    st = c.final_state["state"]
    assert np.isfinite(np.asarray(st["body"].x)).all()
    assert float(c.final_state["diag"]["v_min"]) > 0.0
