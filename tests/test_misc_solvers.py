"""electrostaticFoam, boundaryFoam, porousSimpleFoam — case-driven
end-to-end tests (reference: applications/solvers/electromagnetics/,
incompressible/boundaryFoam, incompressible/porousSimpleFoam)."""

import os

import numpy as np
import pytest

FOAMFILE = 'FoamFile {{ version 2.0; format ascii; class {cls}; object {obj}; }}\n'


def _write(case, rel, body, cls="dictionary"):
    path = os.path.join(case, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(FOAMFILE.format(cls=cls, obj=os.path.basename(rel)) + body)


def _mk_case(tmp, name, blockmesh, files):
    case = os.path.join(tmp, name)
    os.makedirs(case, exist_ok=True)
    _write(case, "constant/polyMesh/blockMeshDict", blockmesh)
    for rel, (body, cls) in files.items():
        _write(case, rel, body, cls)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    return case


CHANNEL_BM = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 0.1 0) (0 0.1 0)
    (0 0 0.01) (1 0 0.01) (1 0.1 0.01) (0 0.1 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) ({nx} {ny} 1) simpleGrading (1 1 1) );
boundary
(
    left  {{ type patch; faces ((0 4 7 3)); }}
    right {{ type patch; faces ((2 6 5 1)); }}
    walls {{ type wall; faces ((1 5 4 0) (3 7 6 2)); }}
    frontAndBack {{ type empty; faces ((0 3 2 1) (4 5 6 7)); }}
);
"""

CONTROL = """
application     {app};
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         {end};
deltaT          {dt};
writeControl    timeStep;
writeInterval   1000;
writeFormat     ascii;
"""

SCHEMES = """
ddtSchemes {{ default {ddt}; }}
gradSchemes {{ default Gauss linear; }}
divSchemes {{ default none; div(phi,U) Gauss upwind; div(rhoFlux,rho) Gauss upwind; }}
laplacianSchemes {{ default Gauss linear corrected; }}
interpolationSchemes {{ default linear; }}
snGradSchemes {{ default corrected; }}
"""


def test_electrostatic_capacitor(tmp_path):
    """Uniform space charge between grounded plates: phi must match the
    1D Poisson parabola phi(x) = rho/(2 eps0) x (x - L)."""
    eps0, rho0, L = 8.85418782e-12, 1e-8, 1.0
    case = _mk_case(str(tmp_path), "cap",
                    CHANNEL_BM.format(nx=40, ny=1), {
        "system/controlDict": (CONTROL.format(
            app="electrostaticFoam", end=1, dt=1), "dictionary"),
        "system/fvSchemes": (SCHEMES.format(ddt="Euler"), "dictionary"),
        "system/fvSolution": ("""
solvers
{
    phi { solver PCG; preconditioner DIC; tolerance 1e-10; relTol 0; }
    rho { solver PBiCGStab; preconditioner DILU; tolerance 1e-10; relTol 0; }
}
""", "dictionary"),
        "constant/physicalProperties": ("""
epsilon0        epsilon0 [ -1 -3 4 0 0 2 0 ] 8.85418782e-12;
k               k [ -1 0 2 0 0 1 0 ] 0;
""", "dictionary"),
        "0/phi": ("""
dimensions      [1 2 -3 0 0 -1 0];
internalField   uniform 0;
boundaryField
{
    left  { type fixedValue; value uniform 0; }
    right { type fixedValue; value uniform 0; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
        "0/rho": ("""
dimensions      [0 -3 1 0 0 1 0];
internalField   uniform 1e-8;
boundaryField
{
    left  { type zeroGradient; }
    right { type zeroGradient; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
    })
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=1)
    phi = np.asarray(c.final_state["phi"].data)
    x = np.asarray(c.mesh.c)[:, 0]
    exact = rho0 / (2 * eps0) * x * (x - L)
    scale = np.abs(exact).max()
    assert np.abs(phi - exact).max() < 0.02 * scale, (
        phi[:4], exact[:4])


def test_boundaryfoam_laminar_poiseuille(tmp_path):
    """boundaryFoam laminar channel: the converged profile is
    Poiseuille with max/mean = 1.5."""
    case = _mk_case(str(tmp_path), "bl",
                    CHANNEL_BM.format(nx=1, ny=40), {
        "system/controlDict": (CONTROL.format(
            app="boundaryFoam", end=200, dt=1), "dictionary"),
        "system/fvSchemes": (SCHEMES.format(ddt="steadyState"),
                             "dictionary"),
        "system/fvSolution": ("""
solvers
{
    U { solver PCG; preconditioner DIC; tolerance 1e-10; relTol 0; }
}
""", "dictionary"),
        "constant/transportProperties": ("""
transportModel  Newtonian;
nu              nu [0 2 -1 0 0 0 0] 1e-3;
Ubar            Ubar [0 1 -1 0 0 0 0] (1 0 0);
""", "dictionary"),
        "0/U": ("""
dimensions      [0 1 -1 0 0 0 0];
internalField   uniform (1 0 0);
boundaryField
{
    left  { type zeroGradient; }
    right { type zeroGradient; }
    walls { type fixedValue; value uniform (0 0 0); }
    frontAndBack { type empty; }
}
""", "volVectorField"),
    })
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=200)
    U = np.asarray(c.final_state["U"].data)
    ux = U[:, 0]
    assert abs(ux.mean() - 1.0) < 0.01           # bulk velocity held
    assert abs(ux.max() / ux.mean() - 1.5) < 0.03  # parabolic
    y = np.asarray(c.mesh.c)[:, 1]
    exact = 1.5 * (1.0 - ((y - 0.05) / 0.05) ** 2)
    assert np.abs(ux - exact).max() < 0.05


def test_porous_simplefoam_darcy_drop(tmp_path):
    """porousSimpleFoam: a porous block in mid-channel adds the Darcy
    pressure drop dp = nu * d * Ubulk * L_porous (kinematic p)."""
    nu, dcoef, ubulk = 1e-3, 1000.0, 0.1
    case = _mk_case(str(tmp_path), "por",
                    CHANNEL_BM.format(nx=30, ny=6), {
        "system/controlDict": (CONTROL.format(
            app="porousSimpleFoam", end=400, dt=1), "dictionary"),
        "system/fvSchemes": (SCHEMES.format(ddt="steadyState"),
                             "dictionary"),
        "system/fvSolution": ("""
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-8; relTol 0.01; }
    U { solver PBiCGStab; preconditioner DILU; tolerance 1e-8; relTol 0.1; }
}
SIMPLE
{
    nNonOrthogonalCorrectors 0;
    residualControl { p 1e-5; U 1e-6; }
}
relaxationFactors
{
    fields { p 0.3; }
    equations { U 0.7; }
}
""", "dictionary"),
        "constant/transportProperties": ("""
transportModel  Newtonian;
nu              nu [0 2 -1 0 0 0 0] 1e-3;
""", "dictionary"),
        "constant/porousZones": ("""
porosity1
{
    selectionMode   box;
    box             ((0.4 -1 -1) (0.6 1 1));
    Darcy
    {
        d   d [0 -2 0 0 0 0 0] (1000 1000 1000);
        f   f [0 -1 0 0 0 0 0] (0 0 0);
    }
}
""", "dictionary"),
        "0/U": ("""
dimensions      [0 1 -1 0 0 0 0];
internalField   uniform (0.1 0 0);
boundaryField
{
    left  { type fixedValue; value uniform (0.1 0 0); }
    right { type zeroGradient; }
    walls { type slip; }
    frontAndBack { type empty; }
}
""", "volVectorField"),
        "0/p": ("""
dimensions      [0 2 -2 0 0 0 0];
internalField   uniform 0;
boundaryField
{
    left  { type zeroGradient; }
    right { type fixedValue; value uniform 0; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
    })
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=400)
    p = np.asarray(c.final_state["p"].data)
    x = np.asarray(c.mesh.c)[:, 0]
    p_up = p[x < 0.35].mean()
    p_down = p[x > 0.65].mean()
    dp = p_up - p_down
    dp_exact = nu * dcoef * ubulk * 0.2   # Darcy over the 0.2 m block
    assert abs(dp - dp_exact) / dp_exact < 0.15, (dp, dp_exact)


def test_potentialfoam_uniform_channel(tmp_path):
    """potentialFoam on a straight channel must return the exact
    uniform velocity (r2 regression: the non-orth loop used to feed
    the updated divergence-free flux back into the RHS, collapsing
    Phi to zero on the second iteration)."""
    case = _mk_case(str(tmp_path), "pot",
                    CHANNEL_BM.format(nx=10, ny=5), {
        "system/controlDict": (CONTROL.format(
            app="potentialFoam", end=1, dt=1), "dictionary"),
        "system/fvSchemes": (SCHEMES.format(ddt="steadyState"),
                             "dictionary"),
        "system/fvSolution": ("""
solvers { p { solver PCG; preconditioner DIC; tolerance 1e-8; relTol 0; } }
potentialFlow { nNonOrthogonalCorrectors 2; }
""", "dictionary"),
        "0/U": ("""
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0 0 0);
boundaryField
{
    left  { type fixedValue; value uniform (1 0 0); }
    right { type zeroGradient; }
    walls { type slip; }
    frontAndBack { type empty; }
}
""", "volVectorField"),
        "0/p": ("""
dimensions [0 2 -2 0 0 0 0];
internalField uniform 0;
boundaryField
{
    left  { type zeroGradient; }
    right { type fixedValue; value uniform 0; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
    })
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=1)
    U = np.asarray(c.final_state["U"].data)
    assert np.allclose(U[:, 0], 1.0, atol=1e-4)
    assert np.abs(U[:, 1]).max() < 1e-4
