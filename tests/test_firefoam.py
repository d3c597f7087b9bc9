"""fireFoam (solvers/firefoam.py): buoyant diffusion flame with
infinitelyFastChemistry + pyrolysis-region coupling (reference:
applications/solvers/combustion/fireFoam/)."""

import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUT = os.path.join(REPO, "tutorials", "combustion", "fireFoam",
                   "smallPoolFire2D")


def _sed(path, old, new):
    with open(path) as f:
        s = f.read()
    assert old in s, f"{old!r} not in {path}"
    with open(path, "w") as f:
        f.write(s.replace(old, new))


@pytest.mark.slow
def test_pool_fire_ignites_and_rises(tmp_path):
    """The methane pool ignites (mixed-is-burnt), the hot plume rises
    buoyantly, and mass fractions stay bounded with sum(Y)=1."""
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    case = str(tmp_path / "pool")
    shutil.copytree(TUT, case)
    assert main(["blockMesh", "-case", case]) == 0
    c = run_case(case, max_steps=40)
    st = c.final_state
    T = np.asarray(st["T"].data)
    U = np.asarray(st["U"].data)
    Y = np.asarray(st["Y"].data)
    assert np.isfinite(T).all() and np.isfinite(U).all()
    assert T.max() > 700.0, f"no ignition: Tmax={T.max()}"
    # buoyant plume: upward velocity above the pool
    cc = np.asarray(c.mesh.c)
    plume = (np.abs(cc[:, 0]) < 0.1) & (cc[:, 1] > 0.3) & (cc[:, 1] < 0.7)
    assert U[plume, 1].mean() > 0.05, "no buoyant plume"
    assert Y.min() >= -1e-6 and Y.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(Y.sum(axis=1), 1.0, atol=1e-3)
    # CO2 produced
    assert Y[:, 2].max() > 1e-3


@pytest.mark.slow
def test_pyrolysis_region_feeds_the_fire(tmp_path):
    """A pyrolysing base patch under hot gas releases fuel gas into the
    adjacent cells and loses solid mass (regionmodels coupling)."""
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    case = str(tmp_path / "burn")
    shutil.copytree(TUT, case)
    # hot gas so the solid heats immediately; base becomes a wall
    _sed(os.path.join(case, "0", "T"), "internalField   uniform 300",
         "internalField   uniform 900")
    _sed(os.path.join(case, "0", "U"),
         "type flowRateInletVelocity; massFlowRate 0.001; "
         "value uniform (0 0.05 0);",
         "type fixedValue; value uniform (0 0 0);")
    _sed(os.path.join(case, "0", "CH4"),
         "base { type fixedValue; value uniform 1; }",
         "base { type zeroGradient; }")
    with open(os.path.join(case, "constant", "pyrolysisProperties"),
              "w") as f:
        f.write("""
FoamFile { version 2.0; format ascii; class dictionary; object pyrolysisProperties; }
patches ( base );
reactingOneDimCoeffs
{
    nLayers 6; thickness 0.005; k 0.2; rho 500; rhoChar 50;
    Cp 1500; A 1e5; Ta 8000; h 200; T0 600;
}
""")
    assert main(["blockMesh", "-case", case]) == 0
    c = run_case(case, max_steps=30)
    st = c.final_state
    assert "pyro" in st
    rho_s = np.asarray(st["pyro"]["rho_s"])
    assert rho_s.min() < 500.0 - 1e-3, "no pyrolysis mass loss"
    m_gas = np.asarray(st["pyro_m_gas"])
    assert m_gas.max() > 0.0
    # released fuel shows up in the gas near the base
    Y = np.asarray(st["Y"].data)
    cc = np.asarray(c.mesh.c)
    near = cc[:, 1] < 0.05
    assert Y[near, 0].max() > 1e-5, "no fuel released into the gas"
    assert np.isfinite(np.asarray(st["T"].data)).all()
