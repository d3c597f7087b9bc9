"""regionModels: film surface mesh, kinematic/thermo single-layer
films, reactingOneDim pyrolysis columns (reference:
src/regionModels/{surfaceFilmModels,pyrolysisModels}/)."""

import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh
from foamtpu.regionmodels import (FilmConfig, FilmMesh, PyrolysisConfig,
                                  build_film_mesh, film_init, film_step,
                                  pyro_init, pyro_step)

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 0.2 0) (0 0.2 0)
    (0 0 0.5) (1 0 0.5) (1 0.2 0.5) (0 0.2 0.5)
);
blocks ( hex (0 1 2 3 4 5 6 7) (20 4 10) simpleGrading (1 1 1) );
boundary
(
    bottom { type wall; faces ((0 1 5 4)); }
    top    { type wall; faces ((3 7 6 2)); }
    sides  { type patch; faces ((0 4 7 3) (1 2 6 5) (0 3 2 1) (4 5 6 7)); }
);
"""


def _bottom_film():
    poly = blockmesh.generate(parse_string(BOX))
    return build_film_mesh(poly, ["bottom"])


def test_film_mesh_topology():
    fm = _bottom_film()
    assert fm.n_faces == 20 * 10
    # interior edges of a 20x10 quad grid: 19*10 + 20*9
    assert fm.n_edges == 19 * 10 + 20 * 9
    n = np.asarray(fm.n)
    # bottom wall: outward normal -y, film normal INTO the fluid = +y
    np.testing.assert_allclose(n[:, 1], 1.0, atol=1e-12)
    assert np.allclose(np.asarray(fm.area), 0.05 * 0.05)
    # edge normals are tangential (perpendicular to the film normal)
    em = np.asarray(fm.e_m)
    assert np.abs(em[:, 1]).max() < 1e-12


def test_film_terminal_velocity():
    """Uniform film on a plane with tangential gravity reaches the
    Nusselt terminal velocity U = g_t delta^2/(3 nu) (reference:
    kinematicSingleLayer momentum balance)."""
    fm = _bottom_film()
    delta0 = 1e-3
    cfg = FilmConfig(nu=1e-6, rho=1000.0, g=(2.0, -9.0, 0.0))
    st = film_init(fm, cfg, delta0=delta0)
    dt = 0.005
    t = 0.0
    for _ in range(100):
        st, diag = film_step(fm, st, dt, cfg)
        t += dt
    # analytic transient U(t) = U_inf (1 - exp(-3 nu t / delta^2));
    # check interior cells (the closed upstream boundary column drains
    # — the region has no inflow — so exclude the edge strips)
    u_inf = 2.0 * delta0 ** 2 / (3.0 * cfg.nu)
    u_t = u_inf * (1.0 - np.exp(-3.0 * cfg.nu * t / delta0 ** 2))
    cf = np.asarray(fm.cf)
    interior = (cf[:, 0] > 0.45) & (cf[:, 0] < 0.8)
    ux = np.asarray(st["Uf"][:, 0])[interior]
    np.testing.assert_allclose(ux, u_t, rtol=3e-2)
    np.testing.assert_allclose(
        np.asarray(st["delta"])[interior], delta0, rtol=1e-2)


def test_film_mass_conservation_sloshing():
    """Non-uniform film redistributes under gravity+inertia; closed
    boundary edges conserve total film mass exactly."""
    fm = _bottom_film()
    cfg = FilmConfig(nu=1e-6, rho=1000.0, g=(0.0, -9.81, 0.0))
    st = film_init(fm, cfg, delta0=1e-3)
    cf = np.asarray(fm.cf)
    bump = 1e-3 + 2e-3 * np.exp(-((cf[:, 0] - 0.5) ** 2
                                  + (cf[:, 2] - 0.25) ** 2) / 0.02)
    st["delta"] = jnp.asarray(bump, fm.area.dtype)
    # seed a spreading flow from the bump (pure gravity normal to the
    # plane produces none)
    st["Uf"] = jnp.asarray(
        np.stack([0.1 * (cf[:, 0] - 0.5), np.zeros(fm.n_faces),
                  0.1 * (cf[:, 2] - 0.25)], axis=1), fm.area.dtype)
    m0 = float(jnp.sum(st["delta"] * fm.area))
    for _ in range(100):
        st, diag = film_step(fm, st, 0.005, cfg)
    m1 = float(jnp.sum(st["delta"] * fm.area))
    assert abs(m1 - m0) / m0 < 1e-5
    assert np.isfinite(np.asarray(st["Uf"])).all()


def test_thermo_film_evaporation():
    """thermoSingleLayer: a film above saturation loses mass at the
    evaporation rate and cools by latent heat."""
    fm = _bottom_film()
    cfg = FilmConfig(nu=1e-6, rho=1000.0, g=(0.0, -9.81, 0.0),
                     thermo=True, T_sat=373.15, evap_coeff=1e-3,
                     L_vap=2.26e6, cp=4187.0)
    st = film_init(fm, cfg, delta0=1e-3, T0=393.15)   # 20 K superheat
    dt = 0.01
    m0 = float(jnp.sum(cfg.rho * st["delta"] * fm.area))
    st1, diag = film_step(fm, st, dt, cfg)
    m1 = float(jnp.sum(cfg.rho * st1["delta"] * fm.area))
    # expected: evap_coeff * 20 K * area_total * dt
    area_tot = float(jnp.sum(fm.area))
    dm_exp = 1e-3 * 20.0 * area_tot * dt
    np.testing.assert_allclose(m0 - m1, dm_exp, rtol=5e-3)
    assert float(jnp.max(st1["Tf"])) < 393.15     # latent cooling


def test_pyrolysis_inert_column():
    """No heat flux: columns stay at T0, no mass release."""
    cfg = PyrolysisConfig()
    st = pyro_init(10, cfg, T0=300.0)
    st1, diag = pyro_step(st, 0.1, cfg, jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(st1["Ts"]), 300.0, atol=1e-4)
    assert float(jnp.max(jnp.abs(diag["m_gas"]))) < 1e-10


def test_pyrolysis_heated_surface():
    """Surface heat flux drives in-depth conduction (monotone profile)
    and Arrhenius mass loss; released gas balances lost solid mass."""
    cfg = PyrolysisConfig(n_layers=8, thickness=0.008, A=1e6,
                          Ta=10000.0, n_sub=8)
    nF = 5
    st = pyro_init(nF, cfg, T0=300.0)
    dt = 0.05
    q = jnp.full(nF, 5e4)        # 50 kW/m^2
    gas = 0.0
    for _ in range(60):
        st, diag = pyro_step(st, dt, cfg, q)
        gas += float(jnp.sum(diag["m_gas"])) * dt
    Ts = np.asarray(st["Ts"])
    assert Ts[:, 0].max() > 400.0                 # surface heated
    assert (np.diff(Ts, axis=1) <= 1e-3).all()    # monotone into depth
    # mass balance: released gas == initial - final solid inventory
    dz = cfg.thickness / cfg.n_layers
    lost = float(np.sum(cfg.rho_s0 - np.asarray(st["rho_s"]))) * dz
    assert lost > 0.0
    np.testing.assert_allclose(gas, lost, rtol=1e-5)
    # char floor respected
    assert np.asarray(st["rho_s"]).min() >= cfg.rho_char - 1e-6
