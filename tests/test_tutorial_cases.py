"""End-to-end runs of the remaining tutorial cases from unmodified
OpenFOAM-format files: damBreak (interFoam) and forwardStep
(rhoCentralFoam), exercising the full blockMesh/setFields/run pipeline
(reference: the Allrun scripts in tutorials/)."""

import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup(tmp_path_factory, rel, steps_cmds=()):
    src = os.path.join(REPO, "tutorials", *rel)
    d = tmp_path_factory.mktemp(rel[-1])
    dst = os.path.join(d, rel[-1])
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", dst]) == 0
    for cmd in steps_cmds:
        assert main([cmd, "-case", dst]) == 0
    return dst


@pytest.mark.slow
def test_dambreak_case(tmp_path_factory):
    dst = _setup(tmp_path_factory,
                 ["multiphase", "interFoam", "laminar", "damBreak"],
                 steps_cmds=["setFields"])
    # water column initialised
    from foamtpu.core.case import Case, run_case

    case0 = Case(dst)
    a0 = np.asarray(case0.read_field("alpha1").data)
    assert 0.1 < a0.mean() < 0.2  # column ~12.5% of the domain
    assert set(np.unique(a0)) <= {0.0, 1.0}

    os.environ["FOAMTPU_CHUNK"] = "10"
    case = run_case(dst, max_steps=40)
    state = case.final_state
    a = np.asarray(state["alpha"].data)
    u = np.asarray(state["U"].data)
    assert np.isfinite(a).all() and np.isfinite(u).all()
    assert a.min() > -1e-3 and a.max() < 1.0 + 1e-3
    # mass conserved
    v = np.asarray(case.mesh.v)
    assert abs((a * v).sum() - (a0 * v).sum()) / (a0 * v).sum() < 1e-2
    # output written and re-readable
    out = case.read_field("alpha1", time=case.time.name)
    assert np.isfinite(np.asarray(out.data)).all()


@pytest.mark.slow
def test_forwardstep_case(tmp_path_factory):
    dst = _setup(tmp_path_factory,
                 ["compressible", "rhoCentralFoam", "forwardStep"])
    from foamtpu.core.case import run_case

    os.environ["FOAMTPU_CHUNK"] = "25"
    case = run_case(dst, max_steps=150)
    state = case.final_state
    rho = np.asarray(state["rho"].data)
    assert np.isfinite(rho).all()
    assert rho.min() > 0.05 and rho.max() < 12.0
    # thermo from the dictionary: R and gamma recovered
    from foamtpu.models import thermo as th

    pg = th.from_dict(case.properties("thermophysicalProperties"))
    np.testing.assert_allclose(pg.R, 0.714286, rtol=1e-4)
    np.testing.assert_allclose(pg.gamma, 1.4, rtol=1e-3)


def test_counterflowflame_reactingfoam(tmp_path_factory):
    """reactingFoam runs dictionary-driven from the counterFlowFlame2D
    tutorial: foamChemistry mechanism + janaf species thermo + Yi
    fields (reference: tutorials/combustion/reactingFoam/laminar/
    counterFlowFlame2D)."""
    dst = _setup(tmp_path_factory,
                 ["combustion", "reactingFoam", "counterFlowFlame2D"])
    from foamtpu.core.case import Case, run_case

    case = run_case(dst, max_steps=3)
    state = case.final_state
    Y = np.asarray(state["Y"].data)
    T = np.asarray(state["T"].data)
    assert np.isfinite(Y).all() and np.isfinite(T).all()
    assert Y.min() > -1e-6 and Y.max() < 1.0 + 1e-6
    assert np.allclose(Y.sum(axis=1), 1.0, atol=1e-4)
    assert T.min() > 200.0 and T.max() < 4000.0
    # the mechanism parsed into one CH4 oxidation reaction
    from foamtpu.models import chemistry as chem_mod

    rx = case.properties("reactions")
    thd = case.properties("thermo.compressibleGas")
    chem, W = chem_mod.from_foam_files(rx, thd)
    assert list(chem.species) == ["O2", "H2O", "CH4", "CO2", "N2"]
    assert chem.lhs.shape == (1, 5)
    i_ch4 = chem.species.index("CH4")
    i_o2 = chem.species.index("O2")
    assert float(chem.lhs[0, i_ch4]) == 1.0
    assert float(chem.lhs[0, i_o2]) == 2.0
    # janaf-derived formation enthalpies: CH4 ~ -74.9 MJ/kmol
    assert abs(float(chem.hf[i_ch4]) / 1e6 + 74.9) < 3.0
    assert abs(float(W[i_ch4]) - 16.04) < 0.1


def test_oscillatingbox_pimpledymfoam(tmp_path_factory):
    """pimpleDyMFoam runs dictionary-driven from constant/
    dynamicMeshDict (solidBodyMotionFvMesh / oscillatingLinearMotion)
    (reference: pimpleDyMFoam + dynamicMeshDict tutorials)."""
    dst = _setup(tmp_path_factory,
                 ["incompressible", "pimpleDyMFoam", "oscillatingBox"])
    from foamtpu.core.case import Case, run_case

    case = run_case(dst, max_steps=5)
    state = case.final_state
    u = np.asarray(state["U"].data)
    assert np.isfinite(u).all()
    # the mesh really moved: state points differ from points0
    pts = np.asarray(state["points"])
    pts0 = np.asarray(state["points0"])
    assert np.abs(pts - pts0).max() > 1e-5


def test_depthcharge2d_compressibleinterfoam(tmp_path_factory):
    """compressibleInterFoam runs dictionary-driven from the
    depthCharge2D tutorial (reference: tutorials/multiphase/
    compressibleInterFoam/laminar/depthCharge2D)."""
    dst = _setup(tmp_path_factory,
                 ["multiphase", "compressibleInterFoam", "depthCharge2D"],
                 steps_cmds=["setFields"])
    from foamtpu.core.case import run_case

    case = run_case(dst, max_steps=5)
    state = case.final_state
    a = np.asarray(state["alpha"].data)
    p = np.asarray(state["p_abs"])
    assert np.isfinite(a).all() and np.isfinite(p).all()
    assert a.min() > -1e-4 and a.max() < 1.0 + 1e-4
    # the charge is over-pressurised and the far field is still ambient
    assert p.max() > 2e5 and p.min() < 2e5


def test_bubblecolumn_twophaseeulerfoam(tmp_path_factory):
    """twoPhaseEulerFoam runs dictionary-driven from the bubbleColumn
    tutorial: air injected at the bottom of a water column rises
    (reference: tutorials/multiphase/twoPhaseEulerFoam/bubbleColumn)."""
    dst = _setup(tmp_path_factory,
                 ["multiphase", "twoPhaseEulerFoam", "bubbleColumn"])
    from foamtpu.core.case import run_case

    case = run_case(dst, max_steps=50)
    state = case.final_state
    a = np.asarray(state["alpha"].data)
    ua = np.asarray(state["Ua"].data)
    assert np.isfinite(a).all() and np.isfinite(ua).all()
    assert a.min() > -1e-5 and a.max() < 1.0 + 1e-5
    # air entered at the bottom and is rising
    assert a.max() > 0.05
    c = np.asarray(case.mesh.c)
    low = c[:, 1] < 0.2
    assert a[low].max() > 0.05
    sel = a > 0.01
    assert ua[sel, 1].mean() > 0.01
