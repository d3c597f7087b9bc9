"""Chemistry model tests (reference:
src/thermophysicalModels/chemistryModel/ + test of the per-cell stiff
integration pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.models.chemistry import ChemistryModel


def _first_order():
    # A -> B, first order, k = A0 exp(-Ta/T)
    return ChemistryModel.build(
        ["A", "B"],
        [{"lhs": [("A", 1.0)], "rhs": [("B", 1.0)],
          "A": 1e3, "beta": 0.0, "Ta": 2000.0}])


def test_first_order_decay_analytic():
    """A->B at fixed T: c_A(t) = c0 exp(-k t) exactly."""
    chem = _first_order()
    T = 800.0
    k = float(chem.k(jnp.asarray(T))[0])
    c0 = jnp.asarray([[2.0, 0.0]])
    dt = 0.5 / k
    c1 = chem.solve(c0, jnp.asarray([T]), dt)
    exact = 2.0 * np.exp(-k * dt)
    assert abs(float(c1[0, 0]) - exact) < 1e-4 * 2.0
    # mass conserved into B
    assert abs(float(c1.sum()) - 2.0) < 1e-6


def test_second_order_and_batch():
    """2A -> C (second order) over a batch of cells at different
    temperatures: c_A(t) = c0/(1 + 2 k c0 t)."""
    chem = ChemistryModel.build(
        ["A", "C"],
        [{"lhs": [("A", 2.0)], "rhs": [("C", 1.0)],
          "A": 50.0, "beta": 0.0, "Ta": 500.0}])
    Ts = jnp.asarray([300.0, 600.0, 1200.0, 2400.0])
    c0 = jnp.tile(jnp.asarray([1.5, 0.0]), (4, 1))
    dt = 0.05
    c1 = chem.solve(c0, Ts, dt)
    for i, T in enumerate(np.asarray(Ts)):
        k = float(chem.k(jnp.asarray(T))[0])
        exact = 1.5 / (1.0 + 2.0 * k * 1.5 * dt)
        assert abs(float(c1[i, 0]) - exact) < 2e-3 * 1.5, (i, T)
    # stoichiometry: dC = -dA/2
    dA = 1.5 - np.asarray(c1[:, 0])
    assert np.allclose(np.asarray(c1[:, 1]), dA / 2, atol=1e-4)


def test_stiff_two_step_mechanism():
    """A ->(fast) B ->(slow) C with rate ratio 1e6: the Rosenbrock
    integration takes stable large steps; totals conserved."""
    chem = ChemistryModel.build(
        ["A", "B", "C"],
        [{"lhs": [("A", 1.0)], "rhs": [("B", 1.0)], "A": 1e6, "Ta": 0.0},
         {"lhs": [("B", 1.0)], "rhs": [("C", 1.0)], "A": 1.0, "Ta": 0.0}])
    c0 = jnp.asarray([[1.0, 0.0, 0.0]])
    c1 = chem.solve(c0, jnp.asarray([1000.0]), 1.0, rtol=1e-6)
    c = np.asarray(c1[0])
    assert abs(c.sum() - 1.0) < 1e-5
    assert c[0] < 1e-6                       # A gone instantly
    # B -> C with k=1 over t=1 from B~1: B ~ exp(-1)
    assert abs(c[1] - np.exp(-1.0)) < 5e-3
    assert abs(c[2] - (1 - np.exp(-1.0))) < 5e-3


def test_heat_release_sign():
    """Exothermic A->B (hf_A > hf_B) releases positive heat."""
    chem = ChemistryModel.build(
        ["A", "B"],
        [{"lhs": [("A", 1.0)], "rhs": [("B", 1.0)], "A": 10.0,
          "Ta": 0.0}],
        hf=[5e7, 0.0])
    q = float(chem.heat_release(jnp.asarray([1.0, 0.0]),
                                jnp.asarray(500.0)))
    assert q > 0.0
