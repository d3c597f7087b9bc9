"""Reacting/evaporating/spray parcel physics (reference:
src/lagrangian/intermediate + spray submodels)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu import lagrangian as lag
from foamtpu.core.dictionary import parse_string
from foamtpu.lagrangian import reactingcloud as rc
from foamtpu.mesh import blockmesh, to_device

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (4 4 4) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""


def _cloud(mesh, n=20, d=1e-4, rho=1000.0):
    rng = np.random.default_rng(0)
    x = 0.2 + 0.6 * rng.random((n, 3))
    return lag.make_cloud(mesh, x, [0.0, 0.0, 0.0], d, rho)


def test_d2_law_evaporation_conserves_mass():
    """Still droplet: d^2 decreases linearly at rate K (Sh=2 -> K_eff
    = K), and the lost parcel mass appears exactly as the per-cell
    vapour source."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    cloud = _cloud(mesh)
    cfg = lag.CloudConfig(rho_f=1.0, mu_f=1.8e-5)
    ecfg = rc.EvapConfig(K_evap=1e-8)
    u_f = jnp.zeros((mesh.n_cells, 3), mesh.v.dtype)
    T_f = jnp.full(mesh.n_cells, 400.0, mesh.v.dtype)
    m0 = float(jnp.sum(jnp.where(cloud.active,
                                 cloud.rho * jnp.pi / 6 * cloud.d ** 3,
                                 0.0)))
    d2_0 = float(cloud.d[0] ** 2)
    dt = jnp.asarray(1e-2, mesh.v.dtype)
    vap_tot = 0.0
    step = jax.jit(lambda c: rc.evaporate(c, u_f, T_f, dt, cfg, ecfg,
                                          mesh.n_cells))
    for _ in range(10):
        cloud, vap, heat = step(cloud)
        vap_tot += float(jnp.sum(vap))
    # d^2 law with Sh = 2: d(d^2)/dt = -K
    d2_exp = d2_0 - 10 * 1e-2 * 1e-8
    assert abs(float(cloud.d[0] ** 2) - d2_exp) < 1e-12
    m1 = float(jnp.sum(jnp.where(cloud.active,
                                 cloud.rho * jnp.pi / 6 * cloud.d ** 3,
                                 0.0)))
    assert abs((m0 - m1) - vap_tot) < 1e-5 * max(m0, 1e-30)
    assert vap_tot > 0


def test_evaporation_kills_exhausted_parcels():
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    cloud = _cloud(mesh, d=2e-6)
    cfg = lag.CloudConfig()
    ecfg = rc.EvapConfig(K_evap=1e-8, d_min=1e-6)
    u_f = jnp.zeros((mesh.n_cells, 3), mesh.v.dtype)
    T_f = jnp.full(mesh.n_cells, 400.0, mesh.v.dtype)
    dt = jnp.asarray(0.2, mesh.v.dtype)
    for _ in range(5):
        cloud, vap, heat = rc.evaporate(cloud, u_f, T_f, dt, cfg,
                                        ecfg, mesh.n_cells)
    assert int(cloud.n_active) == 0     # all droplets evaporated away


def test_devolatilisation_and_char_burnout():
    """Hot carrier: volatiles release following the single kinetic
    rate, then char burnout shrinks the particles; heat source is
    positive."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    base = _cloud(mesh, d=1e-4, rho=1400.0)
    base = base._replace(T=jnp.full_like(base.T, 1200.0))
    coal = rc.CoalCloud(base=base,
                        yvol=jnp.full_like(base.d, 0.4))
    ccfg = rc.CoalConfig(A1=2e5, E=7.4e7, Yvol0=0.4)
    T_f = jnp.full(mesh.n_cells, 1200.0, mesh.v.dtype)
    dt = jnp.asarray(1e-3, mesh.v.dtype)
    kv = 2e5 * np.exp(-7.4e7 / (rc.R_UNIV * 1200.0))
    fuel_tot = 0.0
    for i in range(20):
        coal, fuel, heat = rc.devolatilise(coal, T_f, dt, ccfg,
                                           mesh.n_cells)
        fuel_tot += float(jnp.sum(fuel))
    # analytic exponential decay of the volatile fraction
    yv_exp = 0.4 * np.exp(-kv * 20 * 1e-3)
    assert abs(float(coal.yvol[0]) - yv_exp) < 1e-3 * 0.4
    assert fuel_tot > 0
    assert float(jnp.sum(heat)) >= 0.0
    # drive volatiles out -> char burnout shrinks d
    d_before = float(coal.base.d[0])
    for _ in range(40):
        coal, fuel, heat = rc.devolatilise(
            coal._replace(yvol=jnp.zeros_like(coal.yvol)), T_f,
            dt, ccfg, mesh.n_cells)
    assert float(coal.base.d[0]) < d_before


def test_reitz_diwakar_breakup_direction():
    """High relative velocity (We >> crit) shrinks droplets toward the
    stable diameter; low We leaves them unchanged."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    cloud = _cloud(mesh, d=5e-4, rho=800.0)
    bcfg = rc.BreakupConfig(sigma=0.026, rho_f=30.0, we_crit=6.0)
    # We = 30*100^2*5e-4/0.026 = 5769 >> 6
    u_fast = jnp.full((cloud.u.shape[0], 3), 0.0).at[:, 0].set(100.0)
    d0 = float(cloud.d[0])
    c2 = rc.reitz_diwakar_breakup(cloud, u_fast, 1e-3, bcfg)
    for _ in range(20):
        c2 = rc.reitz_diwakar_breakup(c2, u_fast, 1e-3, bcfg)
    assert float(c2.d[0]) < 0.5 * d0
    # low We: unchanged
    c3 = rc.reitz_diwakar_breakup(cloud, jnp.zeros_like(u_fast),
                                  1e-3, bcfg)
    assert float(c3.d[0]) == d0


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
    walls {{ type {bc}; }}
    frontAndBack {{ type empty; }}
}}
"""

BM2D = """
convertToMeters 1;
vertices
(
    (0 0 0) (0.2 0 0) (0.2 0.2 0) (0 0.2 0)
    (0 0 0.02) (0.2 0 0.02) (0.2 0.2 0.02) (0 0.2 0.02)
);
blocks ( hex (0 1 2 3 4 5 6 7) (8 8 1) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _mk_parcel_case(tmp, app, hot=False, extra=None):
    case = os.path.join(str(tmp), app)
    os.makedirs(case, exist_ok=True)
    _write(case, "constant/polyMesh/blockMeshDict", BM2D)
    _write(case, "system/controlDict", f"""
application     {app};
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         0.01;
deltaT          0.001;
writeControl    timeStep;
writeInterval   1000;
writeFormat     ascii;
""")
    _write(case, "system/fvSchemes", """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind; div(phi,T) Gauss upwind; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
""")
    _write(case, "system/fvSolution", """
solvers
{
    p { solver PCG; preconditioner polynomial; tolerance 1e-8; relTol 0.01; }
    U { solver PBiCGStab; tolerance 1e-7; relTol 0.1; maxIter 300; }
}
PIMPLE { nCorrectors 2; }
""")
    _write(case, "constant/thermophysicalProperties", THERMO)
    T0 = "1200" if hot else "400"
    _write(case, "0/p", FIELD.format(dims="[1 -1 -2 0 0 0 0]",
                                     val="1e5", bc="zeroGradient"),
           cls="volScalarField")
    _write(case, "0/T", FIELD.format(dims="[0 0 0 1 0 0 0]",
                                     val=T0, bc="zeroGradient"),
           cls="volScalarField")
    _write(case, "0/U", FIELD.format(
        dims="[0 1 -1 0 0 0 0]", val="(0 0 0)",
        bc="fixedValue; value uniform (0 0 0)"), cls="volVectorField")
    if extra:
        for rel, body in extra.items():
            _write(case, rel, body)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    return case


def test_reacting_parcel_foam_case(tmp_path):
    """reactingParcelFoam: droplets evaporate into Yvapour, which stays
    bounded; parcels survive tracking."""
    case = _mk_parcel_case(tmp_path, "reactingParcelFoam", extra={
        "constant/reactingCloud1Properties": """
constantProperties { rho0 1000; d0 5e-5; T0 300; Cp0 4187; Lvap 2.26e6; }
Kevap 1e-8;
"""})
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["reactingParcelFoam"](c, max_steps=5)
    Yv = np.asarray(c.final_state["Yv"].data)
    assert Yv.max() > 0.0, "no evaporation reached the carrier"
    assert Yv.min() >= 0.0 and Yv.max() <= 1.0
    assert int(c.final_state["cloud"].n_active) > 0


def test_coal_chemistry_foam_case(tmp_path):
    """coalChemistryFoam: hot carrier devolatilises the coal; the
    released heat RAISES the carrier temperature."""
    case = _mk_parcel_case(tmp_path, "coalChemistryFoam", hot=True,
                           extra={
        "constant/coalCloud1Properties": """
constantProperties { rho0 1400; d0 1e-4; T0 1200; Cp0 1500; Yvolatile 0.4; }
"""})
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["coalChemistryFoam"](c, max_steps=5)
    T = np.asarray(c.final_state["state"]["T"].data)
    assert T.max() > 1200.5, "no combustion heating"
    yv = np.asarray(c.final_state["coal"].yvol)
    assert yv.max() < 0.4, "no devolatilisation"


def test_spray_foam_injection_case(tmp_path):
    """sprayFoam: cone injection activates parcels over time."""
    case = _mk_parcel_case(tmp_path, "sprayFoam", extra={
        "constant/reactingCloud1Properties": """
constantProperties { rho0 800; d0 1e-4; T0 300; Cp0 2000; Lvap 3e5; }
Kevap 1e-10;
injection
{
    position (0.1 0.18 0.01);
    direction (0 -1 0);
    coneAngle 15;
    Umag 20;
    parcelsPerSecond 3000;
}
"""})
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["sprayFoam"](c, max_steps=8)
    n = int(c.final_state["cloud"].n_active)
    assert n >= 32 + 20, f"injection inactive: {n} parcels (32 initial)"


CONTROL_FILM = """
application     reactingParcelFilmFoam;
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         0.25;
deltaT          0.005;
writeControl    timeStep;
writeInterval   1000;
writeFormat     ascii;
"""


def test_reacting_parcel_film_case(tmp_path):
    """reactingParcelFilmFoam: parcels falling under gravity onto the
    film patch deposit their mass into the surface film (film mass
    grows, parcels are absorbed)."""
    case = _mk_parcel_case(tmp_path, "reactingParcelFilmFoam", extra={
        "system/controlDict": CONTROL_FILM,
        "constant/reactingCloud1Properties": """
constantProperties { rho0 1000; d0 2e-4; T0 300; Cp0 4187; Lvap 2.26e6; }
Kevap 1e-12;
""",
        "constant/surfaceFilmProperties": """
filmPatches ( walls );
rho rho [1 -3 0 0 0 0 0] 1000;
nu nu [0 2 -1 0 0 0 0] 1e-6;
""",
        "constant/g": "dimensions [0 1 -2 0 0 0 0]; value (0 -9.81 0);"})
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["reactingParcelFilmFoam"](c, max_steps=45)
    film = c.final_state["film"]
    n_act = int(c.final_state["cloud"].n_active)
    film_mass = float((np.asarray(film["delta"]) * 1000.0).sum())
    assert n_act < 32, "no parcels were absorbed"
    assert film_mass > 0.0, "absorbed parcels did not feed the film"


def test_lts_reacting_parcel_case(tmp_path):
    """LTSReactingParcelFoam: per-cell pseudo-time carrier runs stably
    with parcels on the global dt; fields stay finite and the per-cell
    rdt field varies with the local flow."""
    case = _mk_parcel_case(tmp_path, "LTSReactingParcelFoam", extra={
        "constant/reactingCloud1Properties": """
constantProperties { rho0 1000; d0 5e-5; T0 300; Cp0 4187; Lvap 2.26e6; }
Kevap 1e-8;
"""})
    import foamtpu.solvers.apps  # noqa: F401
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["LTSReactingParcelFoam"](c, max_steps=5)
    st = c.final_state["state"]
    assert np.isfinite(np.asarray(st["T"].data)).all()
    assert "lts_rdt" in st
    assert np.isfinite(np.asarray(st["lts_rdt"])).all()
    assert int(c.final_state["cloud"].n_active) > 0
