"""Discrete-methods tests: DSMC collision relaxation + MD energy
conservation (reference: src/lagrangian/{dsmc,molecularDynamics}/ and
applications/solvers/discreteMethods/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.lagrangian import dsmc, md
from foamtpu import lagrangian as lag
from foamtpu.mesh import blockmesh, to_device

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (6 6 6) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""

ARGON = dsmc.Species(
    mass=jnp.asarray([6.63e-26]),
    d_ref=jnp.asarray([4.17e-10]),
    omega=jnp.asarray([0.81]),
    T_ref=273.0)


def _aniso_cloud(mesh, nd, fn, Tx, Tyz, seed=3):
    """Uniform fill with an anisotropic Maxwellian (hot x, cold y/z)."""
    cloud = dsmc.initialise(mesh, ARGON, nd, Tx, (0.0, 0.0, 0.0), fn,
                            seed=seed)
    rng = np.random.default_rng(seed + 1)
    act = np.asarray(cloud.active)
    n = act.shape[0]
    m = float(ARGON.mass[0])
    sx = np.sqrt(dsmc.K_BOLTZ * Tx / m)
    syz = np.sqrt(dsmc.K_BOLTZ * Tyz / m)
    u = np.stack([sx * rng.standard_normal(n),
                  syz * rng.standard_normal(n),
                  syz * rng.standard_normal(n)], axis=1)
    return cloud._replace(u=jnp.asarray(u, cloud.u.dtype))


def _component_temps(cloud, mass):
    act = np.asarray(cloud.active)
    u = np.asarray(cloud.u)[act]
    c = u - u.mean(axis=0)
    return mass * np.mean(c * c, axis=0) / dsmc.K_BOLTZ


def test_dsmc_collisions_isotropize_and_conserve():
    """VHS collisions drive Tx/Ty/Tz to a common value while conserving
    momentum and kinetic energy exactly (reference: Bird's relaxation
    test for dsmcFoam's VariableHardSphere + NTC selection)."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    nd = 1.0e20
    vc = float(np.asarray(mesh.v)[0])
    fn = nd * vc / 20.0          # ~20 parcels per cell
    cloud = _aniso_cloud(mesh, nd, fn, Tx=600.0, Tyz=150.0)
    m = float(ARGON.mass[0])

    T0 = _component_temps(cloud, m)
    assert T0[0] > 2.5 * T0[1]
    act = np.asarray(cloud.active)
    mom0 = np.asarray(cloud.u)[act].sum(axis=0)
    ke0 = float((np.asarray(cloud.u)[act] ** 2).sum())

    cfg = dsmc.DsmcConfig(nEquivalentParticles=fn, n_rounds=8)
    dt = jnp.asarray(5.0e-6, mesh.v.dtype)
    collide = jax.jit(lambda c: dsmc._collide(mesh, c, dt, cfg, ARGON))
    for _ in range(80):
        cloud = collide(cloud)

    T1 = _component_temps(cloud, m)
    mom1 = np.asarray(cloud.u)[act].sum(axis=0)
    ke1 = float((np.asarray(cloud.u)[act] ** 2).sum())
    # exact pairwise conservation
    assert np.max(np.abs(mom1 - mom0)) / np.abs(mom0).max() < 1e-3 or \
        np.max(np.abs(mom1 - mom0)) < 1e-3 * np.sqrt(ke0)
    assert abs(ke1 - ke0) / ke0 < 1e-4
    # anisotropy decayed substantially
    spread0 = T0.max() - T0.min()
    spread1 = T1.max() - T1.min()
    assert spread1 < 0.35 * spread0
    Tmean = T1.mean()
    assert abs(Tmean - T0.mean()) / T0.mean() < 0.02


def test_dsmc_evolve_in_box_conserves_energy():
    """Full evolve (free flight + specular walls + collisions) in a
    closed box preserves kinetic energy and keeps every parcel
    inside."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    nd = 1.0e20
    vc = float(np.asarray(mesh.v)[0])
    fn = nd * vc / 12.0
    cloud = dsmc.initialise(mesh, ARGON, nd, 300.0, (0.0, 0.0, 0.0),
                            fn, seed=7)
    bt = jnp.asarray(lag.face_boundary_types(mesh))
    cfg = dsmc.DsmcConfig(nEquivalentParticles=fn, n_rounds=4)
    act = np.asarray(cloud.active)
    ke0 = float((np.asarray(cloud.u)[act] ** 2).sum())
    n0 = int(cloud.n_active)
    step = jax.jit(lambda c, dt: dsmc.evolve(mesh, c, dt, bt, cfg,
                                             ARGON))
    for _ in range(20):
        cloud = step(cloud, jnp.asarray(2.0e-5, mesh.v.dtype))
    assert int(cloud.n_active) == n0          # closed box: no escapes
    ke1 = float((np.asarray(cloud.u)[np.asarray(cloud.active)] ** 2
                 ).sum())
    assert abs(ke1 - ke0) / ke0 < 1e-4
    x = np.asarray(cloud.x)[np.asarray(cloud.active)]
    assert x.min() > -1e-6 and x.max() < 1.0 + 1e-6
    flds = jax.jit(lambda c: dsmc.sample_fields(mesh, c, ARGON, fn))(
        cloud)
    T = np.asarray(flds["T"])
    assert 200.0 < T.mean() < 400.0
    rhoN = np.asarray(flds["rhoN"])
    assert abs(rhoN.mean() - nd) / nd < 0.05


def test_md_nve_energy_conservation():
    """Velocity-Verlet + shifted-force LJ conserves total energy
    (reduced units: eps=sigma=m=1)."""
    cfg = md.MdConfig(epsilon=1.0, sigma=1.0, mass=1.0,
                      box=(6.3, 6.3, 6.3), r_cut=2.5)
    x, u = md.lattice_fill(cfg.box, 5, mass=1.0,
                           T0=0.8 / md.K_BOLTZ, seed=1)
    state = md.make_state(x, u, cfg, dtype=jnp.float64 if
                          jax.config.jax_enable_x64 else jnp.float32)
    step = jax.jit(lambda s: md.verlet_step(s, 0.005, cfg))
    _, pot0 = md._pair_forces(state.x, cfg)
    e0 = float(md.kinetic_energy(state, cfg) + pot0)
    ke0 = float(md.kinetic_energy(state, cfg))
    for _ in range(200):
        state, pot = step(state)
    e1 = float(md.kinetic_energy(state, cfg) + pot)
    assert abs(e1 - e0) < 0.01 * abs(ke0)


def test_md_equilibration_reaches_target():
    """mdEquilibrationFoam-style velocity rescaling drives the kinetic
    temperature to targetTemperature."""
    cfg = md.MdConfig(epsilon=1.656e-21, sigma=3.4e-10, mass=6.63e-26,
                      box=(2.14e-9,) * 3, r_cut=8.5e-10)
    x, u = md.lattice_fill(cfg.box, 5, mass=cfg.mass, T0=60.0, seed=2)
    state = md.make_state(x, u, cfg)
    step = jax.jit(lambda s: md.equilibrate_step(s, 1e-14, cfg, 120.0,
                                                 relax=0.1))
    for _ in range(300):
        state, _ = step(state)
    T = float(md.temperature(state, cfg))
    assert abs(T - 120.0) < 12.0


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


CUBE_BM = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (5 5 5) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
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



SCHEMES_MIN = """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
"""

SOLUTION_MIN = """
solvers { }
"""

def test_dsmcfoam_case(tmp_path):
    """dsmcFoam runs dictionary-driven and writes sampled fields with a
    sensible temperature."""
    case = os.path.join(str(tmp_path), "dsmcBox")
    os.makedirs(case, exist_ok=True)
    _write(case, "constant/polyMesh/blockMeshDict", CUBE_BM)
    _write(case, "system/controlDict",
           CONTROL.format(app="dsmcFoam", end="10e-6", dt="1e-6"))
    _write(case, "system/fvSchemes", SCHEMES_MIN)
    _write(case, "system/fvSolution", SOLUTION_MIN)
    _write(case, "constant/dsmcProperties", """
nEquivalentParticles 5e16;
moleculeProperties
{
    Ar { mass 6.63e-26; diameter 4.17e-10; omega 0.81; Tref 273; }
}
""")
    _write(case, "system/dsmcInitialiseDict", """
numberDensities { Ar 1e20; }
temperature 300;
velocity (0 0 0);
""")
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["run", "-case", case]) == 0
    import foamtpu.solvers.apps  # noqa: F401 - populate the registry
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    app = case_mod._APPLICATIONS["dsmcFoam"]
    app(c, max_steps=3)
    T = np.asarray(c.final_state["fields"]["T"])
    assert 200.0 < float(T.mean()) < 400.0


def test_md_equilibration_case(tmp_path):
    """mdEquilibrationFoam reaches the target temperature from a cold
    lattice, dictionary-driven."""
    case = os.path.join(str(tmp_path), "mdBox")
    os.makedirs(case, exist_ok=True)
    bm = CUBE_BM.replace("convertToMeters 1;", "convertToMeters 2.14e-9;")
    _write(case, "constant/polyMesh/blockMeshDict", bm)
    _write(case, "system/controlDict",
           CONTROL.format(app="mdEquilibrationFoam", end="3e-12",
                          dt="1e-14"))
    _write(case, "system/fvSchemes", SCHEMES_MIN)
    _write(case, "system/fvSolution", SOLUTION_MIN)
    _write(case, "constant/moleculeProperties", """
mass 6.63e-26;
epsilon 1.656e-21;
sigma 3.4e-10;
rCut 8.5e-10;
""")
    _write(case, "system/mdInitialiseDict", """
nSide 5;
temperature 60;
targetTemperature 120;
""")
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    import foamtpu.solvers.apps  # noqa: F401 - populate the registry
    import foamtpu.core.case as case_mod
    from foamtpu.core.case import Case

    c = Case(case)
    case_mod._APPLICATIONS["mdEquilibrationFoam"](c)
    assert abs(c.final_state["T"] - 120.0) < 20.0
