"""Liquid property packages (models/liquids.py) — handbook oracles.

Reference: src/thermophysicalModels/properties/liquidProperties/
{H2O/H2O.C, C7H16/C7H16.C} NSRDS correlation sets."""

import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.models.liquids import C7H16, H2O, from_dict, get, nsrds0


T20 = jnp.asarray(293.15)


class TestWater:
    def test_density(self):
        assert float(H2O.rho(T20)) == pytest.approx(998.0, rel=5e-3)

    def test_viscosity(self):
        assert float(H2O.mu(T20)) == pytest.approx(1.0e-3, rel=0.05)

    def test_vapour_pressure_boiling(self):
        # pv(373.15 K) = 1 atm
        assert float(H2O.pv(jnp.asarray(373.15))) == pytest.approx(
            1.013e5, rel=0.02)

    def test_vapour_pressure_20C(self):
        assert float(H2O.pv(T20)) == pytest.approx(2339.0, rel=0.03)

    def test_latent_heat(self):
        assert float(H2O.hl(T20)) == pytest.approx(2.45e6, rel=0.01)

    def test_cp(self):
        assert float(H2O.cp(T20)) == pytest.approx(4187.0, rel=0.01)

    def test_conductivity(self):
        assert float(H2O.kappa(T20)) == pytest.approx(0.60, rel=0.03)

    def test_surface_tension(self):
        assert float(H2O.sigma(T20)) == pytest.approx(0.0728, rel=0.03)


class TestHeptane:
    def test_density(self):
        assert float(C7H16.rho(jnp.asarray(300.0))) == pytest.approx(
            680.0, rel=0.02)

    def test_boiling_point(self):
        # pv(Tb) = 1 atm
        assert float(C7H16.pv(jnp.asarray(371.58))) == pytest.approx(
            1.013e5, rel=0.05)

    def test_latent_heat(self):
        assert float(C7H16.hl(jnp.asarray(300.0))) == pytest.approx(
            3.65e5, rel=0.03)


def test_from_dict_override_and_fallback():
    liq = from_dict("H2O", {"rho": ["NSRDSfunc0", 950.0]})
    assert float(liq.rho(T20)) == 950.0
    # untouched properties fall back to the built-in
    assert float(liq.hl(T20)) == float(H2O.hl(T20))


def test_get_aliases():
    assert get("water") is H2O
    assert get("heptane") is C7H16
    with pytest.raises(ValueError):
        get("unobtanium")


def test_liquid_evaporation_physics():
    """liquid_evaporate: hotter droplets evaporate faster; mass and
    heat budgets consistent."""
    import jax

    from foamtpu.lagrangian import Cloud, CloudConfig
    from foamtpu.lagrangian.reactingcloud import liquid_evaporate

    n = 8
    cloud = Cloud(
        x=jnp.zeros((n, 3)), u=jnp.zeros((n, 3)),
        d=jnp.full(n, 50e-6), rho=jnp.full(n, 998.0),
        cell=jnp.arange(n, dtype=jnp.int32),
        active=jnp.ones(n, bool),
        T=jnp.asarray([300.0] * 4 + [350.0] * 4))
    ucell = jnp.zeros((16, 3))
    tcell = jnp.full(16, 400.0)
    pcell = jnp.full(16, 1.0e5)
    cfg = CloudConfig(rho_f=1.2, mu_f=1.8e-5)
    c2, vap, heat = liquid_evaporate(cloud, ucell, tcell, pcell, 1e-4,
                                     cfg, H2O, 16)
    vap = np.asarray(vap)
    assert np.all(vap[:8] > 0)
    # hotter droplets (higher pv) lose more mass
    assert vap[4:8].mean() > 2.0 * vap[:4].mean()
    # diameters shrank, droplets cooled
    assert np.all(np.asarray(c2.d) < 50e-6)
    assert np.all(np.asarray(c2.T) < np.asarray(cloud.T))
    # heat sink = dm * hl / dt (order of magnitude)
    np.testing.assert_allclose(
        np.asarray(heat)[:8].sum(),
        vap.sum() * float(H2O.hl(jnp.asarray(325.0))) / 1e-4,
        rtol=0.2)
