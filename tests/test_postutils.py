"""Post-processing utility batch (apps/postutils.py; reference:
applications/utilities/postProcessing/): each command runs on a real
case directory through the CLI surface and its output is re-read and
checked against a hand-computed value."""

import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cavity_done(tmp_path_factory):
    """icoFoam cavity run a few steps so U/p are non-trivial."""
    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    dst = str(tmp_path_factory.mktemp("pu") / "cavity")
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", dst]) == 0
    run_case(dst, max_steps=5)
    return dst


def _main(*argv):
    from foamtpu.apps.cli import main

    return main(list(argv))


def test_vorticity_enstrophy_q(cavity_done):
    from foamtpu.core.case import Case

    assert _main("vorticity", "-case", cavity_done) == 0
    assert _main("enstrophy", "-case", cavity_done) == 0
    assert _main("Q", "-case", cavity_done) == 0
    case = Case(cavity_done)
    t = case.latest_time_name()
    w = np.asarray(case.read_field("vorticity", time=t).data)
    ens = np.asarray(case.read_field("enstrophy", time=t).data)
    q = np.asarray(case.read_field("Q", time=t).data)
    assert np.isfinite(w).all() and np.isfinite(q).all()
    # 2D cavity: vorticity is z-only and non-trivial
    assert np.abs(w[:, 2]).max() > 1.0
    assert np.abs(w[:, :2]).max() < 1e-6 * np.abs(w[:, 2]).max()
    np.testing.assert_allclose(ens, 0.5 * (w * w).sum(axis=1),
                               rtol=1e-5, atol=1e-10)


def test_lambda2_flowtype_bounded(cavity_done):
    from foamtpu.core.case import Case

    assert _main("Lambda2", "-case", cavity_done) == 0
    assert _main("flowType", "-case", cavity_done) == 0
    case = Case(cavity_done)
    t = case.latest_time_name()
    ft = np.asarray(case.read_field("flowType", time=t).data)
    assert ft.min() >= -1.0 - 1e-6 and ft.max() <= 1.0 + 1e-6
    lam = np.asarray(case.read_field("Lambda2", time=t).data)
    # vortex core cells exist in the lid-driven cavity
    assert lam.min() < 0.0


def test_co_pe_ptot(cavity_done):
    from foamtpu.core.case import Case

    assert _main("Co", "-case", cavity_done) == 0
    assert _main("Pe", "-case", cavity_done) == 0
    assert _main("ptot", "-case", cavity_done) == 0
    case = Case(cavity_done)
    t = case.latest_time_name()
    co = np.asarray(case.read_field("Co", time=t).data)
    pe = np.asarray(case.read_field("Pe", time=t).data)
    assert co.min() >= 0.0 and np.isfinite(co).all()
    assert pe.min() >= 0.0 and np.isfinite(pe).all()
    pt = np.asarray(case.read_field("ptot", time=t).data)
    p = np.asarray(case.read_field("p", time=t).data)
    U = np.asarray(case.read_field("U", time=t).data)
    np.testing.assert_allclose(pt, p + 0.5 * (U * U).sum(axis=1),
                               rtol=1e-5, atol=1e-10)


def test_wallgradu_yplus(cavity_done):
    from foamtpu.core.case import Case

    assert _main("wallGradU", "-case", cavity_done) == 0
    assert _main("yPlusRAS", "-case", cavity_done) == 0
    case = Case(cavity_done)
    t = case.latest_time_name()
    g = np.asarray(case.read_field("wallGradU", time=t).data)
    yp = np.asarray(case.read_field("yPlus", time=t).data)
    assert np.isfinite(g).all() and np.isfinite(yp).all()
    # the moving lid drives a strong x-gradient at the top wall
    assert np.abs(g[:, 0]).max() > 1.0
    assert yp.max() > 0.0


def test_stress_components(cavity_done):
    from foamtpu.core.case import Case

    assert _main("stressComponents", "-case", cavity_done) == 0
    case = Case(cavity_done)
    t = case.latest_time_name()
    sxy = np.asarray(case.read_field("sigmaxy", time=t).data)
    syx_file = os.path.join(cavity_done, t, "sigmazz")
    assert os.path.exists(syx_file)
    assert np.isfinite(sxy).all() and np.abs(sxy).max() > 0.0


def test_patch_integrate(cavity_done, capsys):
    # area of movingWall = 0.1 x 0.01
    assert _main("patchIntegrate", "p", "movingWall",
                 "-case", cavity_done) == 0
    out = capsys.readouterr().out
    assert "area = 0.001" in out


def test_apply_boundary_layer(cavity_done):
    from foamtpu.core.case import Case

    case = Case(cavity_done)
    t = case.latest_time_name()
    U0 = np.asarray(case.read_field("U", time=t).data)
    assert _main("applyBoundaryLayer", "-ybl", "0.02",
                 "-case", cavity_done) == 0
    U1 = np.asarray(Case(cavity_done).read_field("U", time=t).data)
    # scaled down near walls, unchanged in magnitude ordering
    assert (np.linalg.norm(U1, axis=1)
            <= np.linalg.norm(U0, axis=1) + 1e-12).all()
    assert np.linalg.norm(U1, axis=1).max() > 0.0


def test_mach_on_compressible_case(tmp_path):
    """Mach on a tiny synthetic compressible case: uniform U=100,
    T=300 air -> Ma ~ 100/347."""
    src = os.path.join(REPO, "tutorials", "compressible",
                       "rhoPimpleFoam", "heatedDuct")
    dst = str(tmp_path / "duct")
    shutil.copytree(src, dst)
    assert _main("blockMesh", "-case", dst) == 0
    assert _main("Mach", "-case", dst, "-time", "0") == 0
    from foamtpu.core.case import Case

    ma = np.asarray(Case(dst).read_field("Ma", time="0").data)
    assert np.isfinite(ma).all()
    assert ma.max() < 1.0   # subsonic duct inlet


def test_wallshearstress_pdfplot_probes(cavity_done, capsys):
    from foamtpu.core.case import Case

    assert _main("wallShearStress", "-case", cavity_done) == 0
    case = Case(cavity_done)
    t = case.latest_time_name()
    tau = np.asarray(case.read_field("wallShearStress", time=t).data)
    assert np.isfinite(tau).all() and np.abs(tau).max() > 0

    assert _main("pdfPlot", "p", "-case", cavity_done) == 0
    path = os.path.join(cavity_done, "postProcessing", "pdfPlot", t,
                        "p.xy")
    arr = np.loadtxt(path)
    assert arr.shape[1] == 2
    # pdf integrates to ~1
    dx = arr[1, 0] - arr[0, 0]
    assert abs(arr[:, 1].sum() * dx - 1.0) < 1e-3

    with open(os.path.join(cavity_done, "system", "probesDict"),
              "w") as f:
        f.write("FoamFile { version 2.0; format ascii; "
                "class dictionary; object probesDict; }\n"
                "fields ( p U );\n"
                "probeLocations ( (0.05 0.05 0.005) );\n")
    capsys.readouterr()
    assert _main("probeLocations", "-case", cavity_done) == 0
    out = capsys.readouterr().out
    assert "p @ (0.05 0.05 0.005)" in out
    assert "U @" in out
