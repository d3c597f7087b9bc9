"""janaf thermo tests (reference:
src/thermophysicalModels/specie/thermo/janaf/janafThermo.H)."""

import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.models import thermo


def test_janaf_nasa_polynomial_values():
    """N2 NASA-7 coefficients: Cp rises from ~1.04 kJ/kg.K at 300 K to
    ~1.24 kJ/kg.K at 2000 K (with R = 8314/28.013)."""
    g = thermo.JanafGas(R=8314.47 / 28.0134)
    cp300 = float(g.Cp_of(jnp.asarray(300.0)))
    cp2000 = float(g.Cp_of(jnp.asarray(2000.0)))
    assert abs(cp300 - 1040.0) < 15.0
    assert abs(cp2000 - 1280.0) < 30.0
    # branch continuity at Tcommon
    lo = float(g.Cp_of(jnp.asarray(999.99)))
    hi = float(g.Cp_of(jnp.asarray(1000.01)))
    assert abs(lo - hi) < 2.0


def test_janaf_h_T_roundtrip():
    g = thermo.JanafGas()
    for T0 in (250.0, 600.0, 1500.0, 3000.0):
        h = g.h(jnp.asarray(T0))
        T = float(g.T_from_h(h))
        assert abs(T - T0) < 0.5, (T0, T)


def test_from_dict_selects_janaf():
    d = parse_string("""
thermoType hePsiThermo<pureMixture<sutherland<janaf<perfectGas<specie>>,sensibleEnthalpy>>>;
mixture
{
    specie { nMoles 1; molWeight 28.0134; }
    thermodynamics
    {
        Tlow 200; Thigh 6000; Tcommon 1000;
        highCpCoeffs ( 2.92664 1.4879768e-3 -5.68476e-7 1.0097038e-10
                       -6.753351e-15 -922.7977 5.980528 );
        lowCpCoeffs  ( 3.298677 1.4082404e-3 -3.963222e-6 5.641515e-9
                       -2.444854e-12 -1020.8999 3.950372 );
    }
    transport { As 1.4792e-06; Ts 116; }
}
""")
    g = thermo.from_dict(d)
    assert isinstance(g, thermo.JanafGas)
    assert abs(g.R - 8314.47 / 28.0134) < 0.1
    assert g.sutherland_As > 0
    # Sutherland viscosity at 300K ~ 1.78e-5 Pa.s
    mu = float(g.mu_T(jnp.asarray(300.0)))
    assert abs(mu - 1.78e-5) / 1.78e-5 < 0.05


def test_perfectgas_cp_of_interface():
    g = thermo.PerfectGas(R=287.0, Cv=717.5)
    assert float(g.Cp_of(jnp.asarray(999.0))) == g.Cp
