"""Engine solver tests: slider-crank kinematics + closed-cylinder
adiabatic compression against the isentrope (reference: src/engine/ and
applications/solvers/combustion/coldEngineFoam/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.core.dictionary import parse_string
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, engine as eng, to_device
from foamtpu.models.thermo import PerfectGas
from foamtpu.solvers import engine as engine_solver

CYL = """
convertToMeters 1;
vertices
(
    (0 0 0) (0.05 0 0) (0.05 0.1 0) (0 0.1 0)
    (0 0 0.005) (0.05 0 0.005) (0.05 0.1 0.005) (0 0.1 0.005)
);
blocks ( hex (0 1 2 3 4 5 6 7) (8 24 1) simpleGrading (1 1 1) );
boundary
(
    piston { type wall; faces ((1 5 4 0)); }
    head   { type wall; faces ((3 7 6 2)); }
    liner  { type wall; faces ((0 4 7 3) (2 6 5 1)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""

GEOM = eng.EngineGeometry(rpm=60.0, con_rod_length=0.15, stroke=0.08,
                          clearance=0.02, theta0=-180.0, axis=1)


def test_slider_crank_kinematics():
    """s(0)=0 (TDC), s(180)=stroke (BDC), speed antisymmetric."""
    assert abs(float(eng.piston_displacement(GEOM, 0.0))) < 1e-6
    assert abs(float(eng.piston_displacement(GEOM, 180.0))
               - GEOM.stroke) < 1e-6
    # ds/dtheta > 0 between TDC and BDC
    s90 = float(eng.piston_displacement(GEOM, 90.0))
    assert 0.0 < s90 < GEOM.stroke
    # analytic speed matches finite difference
    th = 47.0
    dth = 0.5
    dps = eng.deg_per_sec(GEOM)
    fd = (float(eng.piston_displacement(GEOM, th + dth))
          - float(eng.piston_displacement(GEOM, th - dth))) \
        / (2 * dth) * dps
    assert abs(float(eng.piston_speed(GEOM, th)) - fd) < 1e-2 * abs(fd)


ISENTROPE_BODY = r"""
import json
import jax.numpy as jnp
import numpy as np
from foamtpu.core.dictionary import parse_string
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, engine as eng, to_device
from foamtpu.models.thermo import PerfectGas
from foamtpu.solvers import engine as engine_solver

CYL = {CYL!r}
GEOM = eng.EngineGeometry(rpm=60.0, con_rod_length=0.15, stroke=0.08,
                          clearance=0.02, theta0=-180.0, axis=1)
d = parse_string(CYL)
pm = blockmesh.generate(d)
mesh = to_device(pm)
assert mesh.v.dtype == jnp.float64
th = PerfectGas(R=287.0, Cv=717.5, mu=1.8e-5)
pts_fn, umesh_fn = eng.piston_motion(GEOM, z_head=0.1, z_piston0=0.0)
cfg = engine_solver.EngineConfig(
    thermo=th, pts_fn=pts_fn, umesh_fn=umesh_fn,
    s_per_cad=1.0 / eng.deg_per_sec(GEOM), n_correctors=2,
    p_ref_value=1e5,
    p_controls={{"solver": "PCG", "preconditioner": "polynomial",
                "tolerance": 1e-10, "relTol": 0.0, "maxIter": 3000}})
p = vol_scalar(mesh, 1e5, name="p")
T = vol_scalar(mesh, 300.0, name="T")
U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U")
state = engine_solver.initial_state(pm, mesh, U, p, T, th, cfg)
step = engine_solver.make_step(mesh, cfg)
m0 = float(np.sum(np.asarray(mesh.v) * np.asarray(th.rho(p.data, T.data))))
V0 = float(np.sum(np.asarray(mesh.v)))
dt = jnp.asarray(1.0, mesh.v.dtype)
for _ in range(150):
    state, diag = step(state, dt)
print(json.dumps({{"V0": V0, "V1": float(diag["V_total"]),
                  "p1": float(diag["p_mean"]), "T1": float(diag["T_mean"]),
                  "m0": m0, "m1": float(diag["mass"])}}))
"""


@pytest.mark.slow
def test_cold_compression_isentrope():
    """Compress BDC -> 150 CAD in a closed adiabatic cylinder (f64
    verification mode): mean p, T follow p V^gamma = const /
    T V^(gamma-1) = const and total mass is conserved (reference:
    coldEngineFoam compression physics). f64 removes the f32
    pressure-residual mass-drift floor; the fast f32 smoke test below
    covers the production path."""
    import json as _json
    import os as _os
    import subprocess as _sp
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env = dict(_os.environ)
    env.update(FOAMTPU_X64="1", JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1")
    body = ISENTROPE_BODY.format(CYL=CYL)
    out = _sp.run([_sys.executable, "-c", body], capture_output=True,
                  text=True, env=env, cwd=repo, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    r = _json.loads(out.stdout.strip().splitlines()[-1])
    g = 1.4
    cr = r["V0"] / r["V1"]
    assert cr > 2.0
    p_is = 1e5 * cr ** g
    T_is = 300.0 * cr ** (g - 1.0)
    assert abs(r["m1"] - r["m0"]) / r["m0"] < 1e-5, "mass not conserved"
    assert abs(r["p1"] - p_is) / p_is < 0.05, (r["p1"], p_is)
    assert abs(r["T1"] - T_is) / T_is < 0.05, (r["T1"], T_is)


def test_cold_compression_short():
    """Short (20 CAD from BDC) compression: mass conserved, pressure
    rising, continuity small — the fast smoke version of the
    isentrope test."""
    d = parse_string(CYL)
    pm = blockmesh.generate(d)
    mesh = to_device(pm)
    th = PerfectGas(R=287.0, Cv=717.5, mu=1.8e-5)
    pts_fn, umesh_fn = eng.piston_motion(GEOM, z_head=0.1,
                                         z_piston0=0.0)
    cfg = engine_solver.EngineConfig(
        thermo=th, pts_fn=pts_fn, umesh_fn=umesh_fn,
        s_per_cad=1.0 / eng.deg_per_sec(GEOM))
    p = vol_scalar(mesh, 1e5, name="p")
    T = vol_scalar(mesh, 300.0, name="T")
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U")
    state = engine_solver.initial_state(pm, mesh, U, p, T, th, cfg)
    step = engine_solver.make_step(mesh, cfg)
    m0 = float(np.sum(np.asarray(mesh.v)
                      * np.asarray(th.rho(p.data, T.data))))
    dt = jnp.asarray(1.0, mesh.v.dtype)
    for _ in range(20):
        state, diag = step(state, dt)
    assert float(diag["mass"]) == pytest.approx(m0, rel=1e-3)
    assert float(diag["p_mean"]) > 1.0e5
    # continuity diag is dimensional (~rho/dt); normalise by them
    dt_sec = 1.0 / eng.deg_per_sec(GEOM)
    assert float(diag["continuity"]) * dt_sec / 1.2 < 1e-2


# ---------------------------------------------------------------------------
# dictionary-driven application tests
# ---------------------------------------------------------------------------

import os

FOAMFILE = ('FoamFile {{ version 2.0; format ascii; class {cls}; '
            'object {obj}; }}\n')


def _write(case, rel, body, cls="dictionary"):
    path = os.path.join(case, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(FOAMFILE.format(cls=cls, obj=os.path.basename(rel))
                + body)


THERMO = """
thermoType hePsiThermo<pureMixture<const<hConst<perfectGas<specie>>,sensibleEnthalpy>>>;
mixture
{
    specie { nMoles 1; molWeight 28.96; }
    thermodynamics { Cp 1004.5; Hf 0; }
    transport { mu 1.8e-05; Pr 0.7; }
}
"""

FIELD = """
dimensions      {dims};
internalField   uniform {val};
boundaryField
{{
    piston {{ type {bc}; }}
    head   {{ type {bc}; }}
    liner  {{ type {bc}; }}
    frontAndBack {{ type empty; }}
}}
"""


def _mk_engine_case(tmp, app, extra=None):
    case = os.path.join(str(tmp), app)
    os.makedirs(case, exist_ok=True)
    _write(case, "constant/polyMesh/blockMeshDict", CYL)
    _write(case, "system/controlDict", f"""
application     {app};
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         30;
deltaT          1;
writeControl    timeStep;
writeInterval   1000;
writeFormat     ascii;
""")
    _write(case, "system/fvSchemes", """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind; div(phi,T) Gauss upwind; div(phi,b) Gauss upwind; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
""")
    _write(case, "system/fvSolution", """
solvers
{
    p { solver PCG; preconditioner polynomial; tolerance 1e-8; relTol 0.001; maxIter 2000; }
    U { solver PBiCGStab; tolerance 1e-7; relTol 0.1; maxIter 300; }
}
PIMPLE { nCorrectors 2; }
""")
    _write(case, "constant/engineGeometry", """
rpm             rpm [0 0 -1 0 0 0 0] 60;
conRodLength    conRodLength [0 1 0 0 0 0 0] 0.15;
stroke          stroke [0 1 0 0 0 0 0] 0.08;
clearance       clearance [0 1 0 0 0 0 0] 0.02;
theta0          -180;
axis            1;
""")
    _write(case, "constant/thermophysicalProperties", THERMO)
    _write(case, "0/p", FIELD.format(dims="[1 -1 -2 0 0 0 0]",
                                     val="1e5", bc="zeroGradient"),
           cls="volScalarField")
    _write(case, "0/T", FIELD.format(dims="[0 0 0 1 0 0 0]",
                                     val="300", bc="zeroGradient"),
           cls="volScalarField")
    _write(case, "0/U", FIELD.format(dims="[0 1 -1 0 0 0 0]",
                                     val="(0 0 0)", bc="fixedValue;"
                                     " value uniform (0 0 0)"),
           cls="volVectorField")
    if extra:
        for rel, body in extra.items():
            _write(case, rel, body)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    return case


def test_cold_engine_foam_case(tmp_path):
    """coldEngineFoam runs dictionary-driven: pressure rises under
    compression from BDC."""
    case = _mk_engine_case(tmp_path, "coldEngineFoam")
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["coldEngineFoam"](c, max_steps=10)
    d = c.final_state["diag"]
    assert float(d["p_mean"]) > 1.0e5
    assert float(d["T_mean"]) > 300.0


def test_engine_foam_ignition_case(tmp_path):
    """engineFoam ignites at the spark angle: b drops and T rises above
    the cold-compression level."""
    case = _mk_engine_case(tmp_path, "engineFoam", extra={
        "constant/combustionProperties": """
Su              Su [0 1 -1 0 0 0 0] 0.15;
Xi              2.0;
qComb           2.0e5;
Tu              300;
ignition
{
    start           -175;
    location        (0.025 0.05 0.0025);
    diameter        0.03;
}
"""})
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["engineFoam"](c, max_steps=12)
    st = c.final_state["state"]
    b = np.asarray(st["b"].data)
    assert b.min() < 0.05          # burnt kernel exists
    assert 0.2 < b.mean() < 0.999  # flame propagating, not all burnt
    assert float(c.final_state["diag"]["T_mean"]) > 305.0


def test_sonicdym_translating_freestream():
    """sonicDyMFoam core (transonic ALE): still gas in a rigidly
    translating closed box picks up the frame velocity uniformly
    (Galilean consistency of the relative-flux transonic
    formulation)."""
    from foamtpu.mesh import moving
    from foamtpu.models.thermo import PerfectGas
    from foamtpu.solvers import engine as es

    BOX = CYL.replace("piston { type wall; faces ((1 5 4 0)); }",
                      "piston { type wall; faces ((1 5 4 0)); }")
    d = parse_string(BOX)
    pm = blockmesh.generate(d)
    mesh = to_device(pm)
    th = PerfectGas(R=287.0, Cv=717.5, mu=1.8e-5)
    pts_fn, umesh_fn = moving.linear_motion((3.0, 0.0, 0.0))
    cfg = es.EngineConfig(thermo=th, pts_fn=pts_fn,
                          umesh_fn=umesh_fn, s_per_cad=1.0,
                          n_correctors=2, p_ref_value=1e5,
                          transonic=True)
    from foamtpu.core.fields import vol_scalar, vol_vector

    p = vol_scalar(mesh, 1e5, name="p")
    T = vol_scalar(mesh, 300.0, name="T")
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U")
    state = es.initial_state(pm, mesh, U, p, T, th, cfg)
    step = es.make_step(mesh, cfg)
    for _ in range(40):
        state, diag = step(state, jnp.asarray(1e-4, mesh.v.dtype))
    # Galilean pickup: the rigidly-translating closed box drags its
    # contents to the frame velocity; the co-moving state is uniform
    Ud = np.asarray(state["U"].data)
    assert abs(Ud[:, 0].mean() - 3.0) < 0.15, Ud[:, 0].mean()
    # acoustic ringing from the impulsive start decays slowly at this
    # viscosity — bound it rather than require full quiescence
    assert np.abs(Ud[:, 0] - Ud[:, 0].mean()).max() < 0.25
    assert np.abs(Ud[:, 1:]).max() < 0.1
    p_dev = float(jnp.max(jnp.abs(state["p"].data - 1e5)))
    assert p_dev < 500.0, p_dev
    assert float(jnp.max(jnp.abs(state["T"].data - 300.0))) < 0.5


def test_spray_engine_foam_case(tmp_path):
    """sprayEngineFoam injects an evaporating cone spray into the
    compressing cylinder: parcels appear, fuel vapour accumulates, and
    the carrier stays finite (reference: applications/solvers/
    lagrangian/sprayFoam/sprayEngineFoam/)."""
    case = _mk_engine_case(tmp_path, "sprayEngineFoam", extra={
        "constant/sprayCloudProperties": """
constantProperties
{
    rho0            rho0 [1 -3 0 0 0 0 0] 700;
    d0              d0 [0 1 0 0 0 0 0] 5e-5;
    T0              T0 [0 0 0 1 0 0 0] 320;
    Cp0             Cp0 [0 2 -2 -1 0 0 0] 2000;
    Lvap            Lvap [0 2 -2 0 0 0 0] 3.5e5;
}
Kevap           1e-7;
maxParcels      256;
injection
{
    position        (0.025 0.09 0.0025);
    direction       (0 -1 0);
    coneAngle       15;
    Umag            60;
    parcelsPerSecond 200;
}
"""})
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["sprayEngineFoam"](c, max_steps=12)
    st = c.final_state["state"]
    d = c.final_state["diag"]
    assert int(d["n_parcels"]) > 0
    assert float(d["Yv_mean"]) > 0.0
    import numpy as np

    assert np.isfinite(np.asarray(st["U"].data)).all()
    assert np.isfinite(np.asarray(st["T"].data)).all()
    yv = np.asarray(st["Yv"])
    assert yv.min() >= 0.0 and yv.max() <= 1.0
    # compression still does its job with the spray active
    assert float(d["p_mean"]) > 1.0e5
