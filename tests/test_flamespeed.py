"""Laminar flame-speed correlations (models/flamespeed.py).

Reference oracles: src/thermophysicalModels/laminarFlameSpeed/
Gulders/Gulders.C (coefficient table + Su0pTphi form) and
RaviPetersen/RaviPetersen.C (piecewise polynomial interpolation)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.models.flamespeed import make_flame_speed


def test_constant_returns_none():
    assert make_flame_speed({"laminarFlameSpeedCorrelation": "constant"}) \
        is None
    assert make_flame_speed({}) is None


def test_gulders_methane_reference_point():
    su = make_flame_speed({
        "laminarFlameSpeedCorrelation": "Gulders",
        "fuel": "Methane", "equivalenceRatio": 1.0})
    # at (Tref, pref) the T/p factors are 1: Su = W phi^eta exp(-xi(phi-1.075)^2)
    expect = 0.422 * math.exp(-5.18 * (1.0 - 1.075) ** 2)
    got = float(su(jnp.asarray(1.013e5), 300.0))
    assert got == pytest.approx(expect, rel=1e-6)


def test_gulders_scaling_exponents():
    su = make_flame_speed({
        "laminarFlameSpeedCorrelation": "Gulders", "fuel": "Propane"})
    s1 = float(su(jnp.asarray(1.013e5), 300.0))
    # Tu doubling: * 2^alpha (alpha=1.77); p doubling: * 2^beta (beta=-0.2)
    s_t = float(su(jnp.asarray(1.013e5), 600.0))
    s_p = float(su(jnp.asarray(2.026e5), 300.0))
    assert s_t / s1 == pytest.approx(2.0 ** 1.77, rel=1e-5)
    assert s_p / s1 == pytest.approx(2.0 ** -0.2, rel=1e-5)


def test_gulders_egr_derates():
    base = make_flame_speed({
        "laminarFlameSpeedCorrelation": "Gulders", "fuel": "Methane"})
    egr = make_flame_speed({
        "laminarFlameSpeedCorrelation": "GuldersEGR", "fuel": "Methane",
        "EGR": 0.1})
    p, tu = jnp.asarray(1.5e5), 350.0
    assert float(egr(p, tu)) == pytest.approx(
        float(base(p, tu)) * (1.0 - 2.1 * 0.1), rel=1e-6)


def test_gulders_vector_field_input():
    su = make_flame_speed({
        "laminarFlameSpeedCorrelation": "Gulders", "fuel": "Methane"})
    p = jnp.asarray([1.0e5, 2.0e5, 5.0e5])
    out = np.asarray(su(p, 300.0))
    assert out.shape == (3,)
    assert np.all(np.diff(out) < 0)          # beta < 0: Su falls with p


def test_ravi_petersen_interpolation():
    # two pressure points, one EqR interval; su polynomial = 1 + phi,
    # exponent polynomial = 1.0 (constant) at p1 and 2.0 at p2
    comb = {
        "laminarFlameSpeedCorrelation": "RaviPetersen",
        "fuel": "Hydrogen", "equivalenceRatio": 1.0,
        "HydrogenCoeffs": {
            "TRef": 320.0,
            "pPoints": [1.0e5, 2.0e5],
            "EqRPoints": [0.5, 2.0],
            "alpha": [[[1.0, 1.0], [3.0, 1.0]]],   # su(phi): 1+phi | 3+phi
            "beta": [[[1.0], [2.0]]],              # exponent: 1 | 2
        }}
    su = make_flame_speed(comb)
    # at p1, Tu=TRef: su = 1+1 = 2
    assert float(su(jnp.asarray(1.0e5), 320.0)) == pytest.approx(2.0, rel=1e-6)
    # at p2: su = 3+1 = 4
    assert float(su(jnp.asarray(2.0e5), 320.0)) == pytest.approx(4.0, rel=1e-6)
    # midpoint pressure: linear blend -> 3; exponent blend -> 1.5
    mid = float(su(jnp.asarray(1.5e5), 640.0))
    assert mid == pytest.approx(3.0 * 2.0 ** 1.5, rel=1e-5)


def test_xifoam_config_wires_correlation():
    from foamtpu.solvers.xifoam import XiFoamConfig

    su = make_flame_speed({
        "laminarFlameSpeedCorrelation": "Gulders", "fuel": "Methane"})
    cfg = XiFoamConfig(flow=None, su_fn=su)
    assert cfg.su_fn is su
