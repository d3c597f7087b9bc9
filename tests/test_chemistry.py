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


def test_chemfoam_adiabatic_reactor(tmp_path):
    """chemFoam: 0-D constant-volume reactor from case dictionaries —
    fuel burns out and T rises by ~q*Y0/cv (reference:
    applications/solvers/combustion/chemFoam/)."""
    import os

    case = str(tmp_path / "chem")
    os.makedirs(case + "/system", exist_ok=True)
    os.makedirs(case + "/constant", exist_ok=True)
    hdr = 'FoamFile { version 2.0; format ascii; class dictionary; object %s; }\n'
    with open(case + "/system/controlDict", "w") as f:
        f.write(hdr % "controlDict" + """
application chemFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.2; deltaT 0.004;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    with open(case + "/system/fvSchemes", "w") as f:
        f.write(hdr % "fvSchemes" + "ddtSchemes { default Euler; }\n"
                + "gradSchemes { default Gauss linear; }\n"
                + "divSchemes { default none; }\n"
                + "laplacianSchemes { default Gauss linear orthogonal; }\n"
                + "interpolationSchemes { default linear; }\n"
                + "snGradSchemes { default orthogonal; }\n")
    with open(case + "/system/fvSolution", "w") as f:
        f.write(hdr % "fvSolution" + "solvers { }\n")
    with open(case + "/constant/reactions", "w") as f:
        f.write(hdr % "reactions" + """
species ( A B );
reactions
{
    burn
    {
        type irreversibleArrheniusReaction;
        reaction "A = B";
        A 20.0; beta 0; Ta 1000;
    }
}
""")
    with open(case + "/constant/initialConditions", "w") as f:
        f.write(hdr % "initialConditions" + """
constantProperty volume;
fractionBasis mass;
fractions { A 0.2; B 0.8; }
p 1e5;
T 1000;
""")
    # no polyMesh needed: chemFoam is zero-dimensional
    from foamtpu.core.case import run_case

    case_o = run_case(case)
    st = case_o.final_state
    # k(1000K) = 20*exp(-1) = 7.36/s over 0.2 s -> ~77% burn minimum
    iA = st["species"].index("A")
    assert st["Y"][iA] < 0.25 * 0.2
    # default hf=0 for unspecified thermo -> T unchanged; at least
    # finite and mass fractions renormalised
    assert abs(sum(st["Y"]) - 1.0) < 1e-3
    assert 990.0 < st["T"] < 1010.0
