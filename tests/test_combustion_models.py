"""Combustion closures (models/combustion.py) + XiFoam (solvers/
xifoam.py). Reference: src/combustionModels/{laminar,PaSR,
infinitelyFastChemistry}/ and applications/solvers/combustion/XiFoam/."""

import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.models.chemistry import ChemistryModel
from foamtpu.models.combustion import Combustion, from_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
XI_TUT = os.path.join(REPO, "tutorials", "combustion", "XiFoam",
                      "moriyoshiHomogeneous")


def _ab_chem(q_mol=0.0):
    return ChemistryModel.build(
        ["A", "B"],
        [{"lhs": [("A", 1.0)], "rhs": [("B", 1.0)],
          "A": 1e3, "beta": 0.0, "Ta": 1000.0}],
        hf=[q_mol, 0.0])


def test_pasr_kappa_damps_rates():
    """PaSR increment = kappa * laminar increment with kappa in (0,1):
    a long mixing time (small epsilon) must freeze the chemistry
    (reference: PaSR.C kappa = (dt+tc)/(dt+tc+tk))."""
    chem = _ab_chem()
    c = jnp.array([[1.0, 0.0], [0.5, 0.5]])
    T = jnp.array([800.0, 900.0])
    dt = 1e-3
    lam = Combustion(chem=chem, model="laminar")
    slow = Combustion(chem=chem, model="PaSR", Cmix=1.0)
    c_lam = lam.advance(c, T, dt)
    eps = jnp.full(2, 1e-8)          # nearly no mixing -> tk huge
    nu = jnp.full(2, 1e-3)
    c_slow = np.asarray(slow.advance(c, T, dt, epsilon=eps, nu_eff=nu))
    d_lam = np.abs(np.asarray(c_lam) - np.asarray(c))
    d_slow = np.abs(c_slow - np.asarray(c))
    assert (d_slow <= d_lam + 1e-12).all()
    assert d_slow.max() < 0.2 * d_lam.max()
    # fast mixing (huge epsilon) -> kappa ~ 1, PaSR ~ laminar
    fast = slow.advance(c, T, dt, epsilon=jnp.full(2, 1e8),
                        nu_eff=jnp.full(2, 1e-6))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(c_lam),
                               rtol=1e-3, atol=1e-6)


def test_infinitely_fast_burns_deficient_reactant():
    """Mixed-is-burnt on CH4 + 2 O2 -> CO2 + 2 H2O: the deficient
    reactant is consumed (to 1/C per step), products appear with the
    right stoichiometry (reference: infinitelyFastChemistry.C)."""
    chem = ChemistryModel.build(
        ["CH4", "O2", "CO2", "H2O"],
        [{"lhs": [("CH4", 1.0), ("O2", 2.0)],
          "rhs": [("CO2", 1.0), ("H2O", 2.0)], "A": 1.0}])
    comb = Combustion(chem=chem, model="infinitelyFastChemistry", C=1.0)
    # O2-deficient cell: 1 CH4, 1 O2 -> extent 0.5
    c = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    c1 = np.asarray(comb.advance(c, jnp.array([300.0]), 1e-3))
    np.testing.assert_allclose(c1[0], [0.5, 0.0, 0.5, 1.0], atol=1e-6)
    # C=5: one fifth of the way to equilibrium per step
    comb5 = Combustion(chem=chem, model="infinitelyFastChemistry", C=5.0)
    c5 = np.asarray(comb5.advance(c, jnp.array([300.0]), 1e-3))
    np.testing.assert_allclose(c5[0], [0.9, 0.8, 0.1, 0.2], atol=1e-6)


def test_from_dict_selects_model():
    chem = _ab_chem()
    d = {"combustionModel": "PaSR<psiChemistryCombustion>",
         "PaSRCoeffs": {"Cmix": 0.3}}
    c = from_dict(d, chem)
    assert c.model == "PaSR" and c.Cmix == 0.3
    d2 = {"combustionModel": "infinitelyFastChemistry<psiCombustion>",
          "infinitelyFastChemistryCoeffs": {"C": 10.0}}
    c2 = from_dict(d2, chem)
    assert c2.model == "infinitelyFastChemistry" and c2.C == 10.0
    assert from_dict({}, chem).model == "laminar"


@pytest.mark.slow
def test_xifoam_flame_propagates(tmp_path):
    """moriyoshiHomogeneous tutorial: the ignition kernel grows — the
    burnt fraction increases monotonically-ish, T stays bounded by the
    adiabatic increment, pressure rises in the closed box."""
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    case = str(tmp_path / "moriyoshi")
    shutil.copytree(XI_TUT, case)
    assert main(["blockMesh", "-case", case]) == 0
    assert main(["setFields", "-case", case]) == 0
    c = run_case(case, max_steps=75)
    st = c.final_state
    b = np.asarray(st["b"].data)
    T = np.asarray(st["T"].data)
    p = np.asarray(st["p"].data)
    assert np.isfinite(b).all() and np.isfinite(T).all()
    burnt0 = (0.005 / 0.05) ** 2          # initial kernel area fraction
    burnt = float(np.mean(b < 0.5))
    assert burnt > 1.5 * burnt0, f"flame did not grow: {burnt}"
    # heat release bounded by q_comb/cp ~ 1636 K above Tu
    assert 400.0 < T.max() < 300.0 + 1.8e6 / 1100.0 + 300.0
    # closed box: mass conserved through the burn (rho = p/(R T))
    v = np.asarray(c.mesh.v)
    mass = float(np.sum(p / (287.0 * T) * v))
    mass0 = 1e5 / (287.0 * 300.0) * float(np.sum(v))
    assert abs(mass - mass0) / mass0 < 0.02
