"""Solver batch 4 — channelFoam, rhoPorousSimpleFoam, sonicLiquidFoam,
magneticFoam (reference: applications/solvers/incompressible/channelFoam,
compressible/{rhoPorousMRFSimpleFoam,sonicLiquidFoam},
electromagnetics/magneticFoam)."""

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


CONTROL = """
application     {app};
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         {end};
deltaT          {dt};
writeControl    timeStep;
writeInterval   100000;
writeFormat     ascii;
"""

SCHEMES = """
ddtSchemes {{ default {ddt}; }}
gradSchemes {{ default Gauss linear; }}
divSchemes {{ default none; div(phi,U) Gauss upwind; div(phi,e) Gauss upwind;
             div(phi,K) Gauss upwind; }}
laplacianSchemes {{ default Gauss linear corrected; }}
interpolationSchemes {{ default linear; }}
snGradSchemes {{ default corrected; }}
"""

CYCLIC_CHANNEL_BM = """
convertToMeters 1;
vertices
(
    (0 0 0) (2 0 0) (2 1 0) (0 1 0)
    (0 0 0.1) (2 0 0.1) (2 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (16 10 1) simpleGrading (1 1 1) );
boundary
(
    inlet  { type cyclic; neighbourPatch outlet; faces ((0 4 7 3)); }
    outlet { type cyclic; neighbourPatch inlet;  faces ((2 6 5 1)); }
    walls  { type wall; faces ((3 7 6 2) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def test_channel_foam_holds_ubar(tmp_path):
    """channelFoam: the dictionary-driven periodic channel holds the
    prescribed bulk velocity through the meanVelocityForce source."""
    case = _mk_case(str(tmp_path), "chan", CYCLIC_CHANNEL_BM, {
        "system/controlDict": (CONTROL.format(
            app="channelFoam", end=5.0, dt=0.05), "dictionary"),
        "system/fvSchemes": (SCHEMES.format(ddt="Euler"), "dictionary"),
        "system/fvSolution": ("""
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-7; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-7; relTol 0; }
    U { solver PBiCGStab; preconditioner DILU; tolerance 1e-8; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2; nNonOrthogonalCorrectors 0; }
""", "dictionary"),
        "system/fvOptions": ("""
momentumSource
{
    type            meanVelocityForce;
    active          true;
    meanVelocityForceCoeffs
    {
        selectionMode   all;
        fieldNames      (U);
        Ubar            (1 0 0);
    }
}
""", "dictionary"),
        "constant/transportProperties": ("""
transportModel  Newtonian;
nu              nu [0 2 -1 0 0 0 0] 0.01;
""", "dictionary"),
        "0/U": ("""
dimensions      [0 1 -1 0 0 0 0];
internalField   uniform (0.5 0 0);
boundaryField
{
    inlet  { type cyclic; }
    outlet { type cyclic; }
    walls  { type fixedValue; value uniform (0 0 0); }
    frontAndBack { type empty; }
}
""", "volVectorField"),
        "0/p": ("""
dimensions      [0 2 -2 0 0 0 0];
internalField   uniform 0;
boundaryField
{
    inlet  { type cyclic; }
    outlet { type cyclic; }
    walls  { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
    })
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=60)
    U = np.asarray(c.final_state["U"].data)
    v = np.asarray(c.mesh.v)
    ubulk = float((U[:, 0] * v).sum() / v.sum())
    assert abs(ubulk - 1.0) < 0.1, f"bulk velocity {ubulk} != Ubar 1.0"


DUCT_BM = """
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


def test_rho_porous_simple_darcy_drop(tmp_path):
    """rhoPorousSimpleFoam: compressible duct with a porous mid-block —
    the Darcy drop is dp = mu * d * U * L (mass-weighted rows)."""
    mu, dcoef, ubulk, Lp = 1.8e-5, 1e8, 1.0, 0.2
    case = _mk_case(str(tmp_path), "rpor", DUCT_BM.format(nx=30, ny=4), {
        "system/controlDict": (CONTROL.format(
            app="rhoPorousSimpleFoam", end=400, dt=1), "dictionary"),
        "system/fvSchemes": (SCHEMES.format(ddt="steadyState"),
                             "dictionary"),
        "system/fvSolution": ("""
solvers
{
    p { solver GAMG; tolerance 1e-8; relTol 0.01; }
    U { solver PBiCGStab; preconditioner DILU; tolerance 1e-8; relTol 0.1; }
    T { solver PBiCGStab; preconditioner DILU; tolerance 1e-8; relTol 0.1; }
}
SIMPLE
{
    nNonOrthogonalCorrectors 0;
    pRefValue 1e5;
    residualControl { p 1e-6; U 1e-7; }
}
relaxationFactors
{
    fields { p 0.3; }
    equations { U 0.7; e 0.7; }
}
""", "dictionary"),
        "constant/thermophysicalProperties": ("""
thermoType hePsiThermo<pureMixture<constTransport<specieThermo<hConstThermo<perfectGas>>>>,sensibleEnthalpy>;
mixture
{
    specie { nMoles 1; molWeight 28.96; }
    thermodynamics { Cp 1005; Hf 0; }
    transport { mu 1.8e-05; Pr 0.7; }
}
""", "dictionary"),
        "constant/porousZones": ("""
porosity1
{
    selectionMode   box;
    box             ((0.4 -1 -1) (0.6 1 1));
    Darcy
    {
        d   d [0 -2 0 0 0 0 0] (1e8 1e8 1e8);
        f   f [0 -1 0 0 0 0 0] (0 0 0);
    }
}
""", "dictionary"),
        "0/U": ("""
dimensions      [0 1 -1 0 0 0 0];
internalField   uniform (1 0 0);
boundaryField
{
    left  { type fixedValue; value uniform (1 0 0); }
    right { type zeroGradient; }
    walls { type slip; }
    frontAndBack { type empty; }
}
""", "volVectorField"),
        "0/p": ("""
dimensions      [1 -1 -2 0 0 0 0];
internalField   uniform 1e5;
boundaryField
{
    left  { type zeroGradient; }
    right { type fixedValue; value uniform 1e5; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
        "0/T": ("""
dimensions      [0 0 0 1 0 0 0];
internalField   uniform 300;
boundaryField
{
    left  { type fixedValue; value uniform 300; }
    right { type zeroGradient; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
    })
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=300)
    p = np.asarray(c.final_state["p"].data)
    x = np.asarray(c.mesh.c)[:, 0]
    dp = p[x < 0.35].mean() - p[x > 0.65].mean()
    dp_exact = mu * dcoef * ubulk * Lp
    assert abs(dp - dp_exact) / dp_exact < 0.2, (dp, dp_exact)


def test_sonic_liquid_wave_speed(tmp_path):
    """sonicLiquidFoam: a pressure step driven in from the left travels
    at the barotropic sound speed c = 1/sqrt(psi) ~ 1483 m/s."""
    psi = 4.54e-7
    c_snd = 1.0 / np.sqrt(psi)
    dt, nsteps = 1e-5, 20
    t_end = dt * nsteps
    case = _mk_case(str(tmp_path), "sonl", DUCT_BM.format(nx=100, ny=1), {
        "system/controlDict": (CONTROL.format(
            app="sonicLiquidFoam", end=t_end, dt=dt), "dictionary"),
        "system/fvSchemes": (SCHEMES.format(ddt="Euler"), "dictionary"),
        "system/fvSolution": ("""
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-8; relTol 0; }
    U { solver PBiCGStab; preconditioner DILU; tolerance 1e-8; relTol 0; }
}
PIMPLE { nOuterCorrectors 2; nCorrectors 2; nNonOrthogonalCorrectors 0; }
""", "dictionary"),
        "constant/thermodynamicProperties": ("""
rho0            rho0 [1 -3 0 0 0 0 0] 1000;
p0              p0 [1 -1 -2 0 0 0 0] 1e5;
psi             psi [0 -2 2 0 0 0 0] 4.54e-07;
""", "dictionary"),
        "constant/transportProperties": ("""
mu              mu [1 -1 -1 0 0 0 0] 0.001;
""", "dictionary"),
        "0/U": ("""
dimensions      [0 1 -1 0 0 0 0];
internalField   uniform (0 0 0);
boundaryField
{
    left  { type zeroGradient; }
    right { type zeroGradient; }
    walls { type slip; }
    frontAndBack { type empty; }
}
""", "volVectorField"),
        "0/p": ("""
dimensions      [1 -1 -2 0 0 0 0];
internalField   uniform 1e5;
boundaryField
{
    left  { type fixedValue; value uniform 2e6; }
    right { type fixedValue; value uniform 1e5; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
    })
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=nsteps)
    p = np.asarray(c.final_state["p"].data)
    x = np.asarray(c.mesh.c)[:, 0]
    x_front = c_snd * t_end          # ~0.30 m
    behind = p[x < x_front - 0.1]
    ahead = p[x > x_front + 0.12]
    assert behind.mean() > 7e5, f"no compression behind front: {behind.mean()}"
    assert ahead.mean() < 2.5e5, f"wave ran ahead of c: {ahead.mean()}"
    assert np.isfinite(p).all()


MAG_BM = """
convertToMeters 1;
vertices
(
    (-1 -1 0) (1 -1 0) (1 1 0) (-1 1 0)
    (-1 -1 0.1) (1 -1 0.1) (1 1 0.1) (-1 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (40 40 1) simpleGrading (1 1 1) );
boundary
(
    sides { type patch; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def test_magnetic_foam_bar_magnet(tmp_path):
    """magneticFoam: a bar magnet magnetised along +x produces B along
    +x inside the magnet, with the external return field opposing it."""
    mu0 = 4e-7 * np.pi
    Mr = 8e5
    case = _mk_case(str(tmp_path), "mag", MAG_BM, {
        "system/controlDict": (CONTROL.format(
            app="magneticFoam", end=1, dt=1), "dictionary"),
        "system/fvSchemes": (SCHEMES.format(ddt="steadyState"),
                             "dictionary"),
        "system/fvSolution": ("""
solvers
{
    psi { solver PCG; preconditioner DIC; tolerance 1e-8; relTol 0; maxIter 2000; }
}
SIMPLE { nNonOrthogonalCorrectors 0; }
""", "dictionary"),
        "constant/transportProperties": ("""
magnets
(
    { box ((-0.25 -0.1 -1) (0.25 0.1 1)); mur 1; Mr 8e5;
      orientation (1 0 0); }
);
""", "dictionary"),
        "0/psi": ("""
dimensions      [0 1 0 0 0 1 0];
internalField   uniform 0;
boundaryField
{
    sides { type zeroGradient; }
    frontAndBack { type empty; }
}
""", "volScalarField"),
    })
    from foamtpu.core.case import run_case

    c = run_case(case)
    B = np.asarray(c.final_state["B"])
    cc = np.asarray(c.mesh.c)
    inside = (np.abs(cc[:, 0]) < 0.2) & (np.abs(cc[:, 1]) < 0.08)
    outside_side = (np.abs(cc[:, 0]) < 0.2) & (np.abs(cc[:, 1]) > 0.5)
    assert np.isfinite(B).all()
    bx_in = B[inside, 0].mean()
    assert bx_in > 0.05 * mu0 * Mr, f"no field inside magnet: {bx_in}"
    # the return field above/below the bar points the other way
    assert B[outside_side, 0].mean() < 0.0
