"""pitzDaily (backward-facing step, kEpsilon, simpleFoam) from
unmodified case files — the reference's second headline config
(SURVEY.md §6). Oracles: mesh validity, stable convergence trend,
recirculation behind the step."""

import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PITZ = os.path.join(REPO, "tutorials", "incompressible", "simpleFoam",
                    "pitzDaily")


@pytest.fixture(scope="module")
def case_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pitz")
    dst = os.path.join(d, "pitzDaily")
    shutil.copytree(PITZ, dst)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", dst]) == 0
    return dst


def test_pitz_mesh(case_dir):
    from foamtpu.io import polymesh as mesh_io
    from foamtpu.mesh.check import check

    m = mesh_io.read(os.path.join(case_dir, "constant", "polyMesh"))
    stats = check(m)
    assert m.n_cells == (16 * 26 + 56 * 26 * 2 + 16 * 26 * 2)
    names = [p.name for p in m.patches]
    assert names[:4] == ["inlet", "outlet", "upperWall", "lowerWall"]
    assert stats["maxNonOrtho"] < 35.0


def test_pitz_simplefoam(case_dir):
    from foamtpu.core.case import run_case

    case = run_case(case_dir, max_steps=200)
    state = case.final_state
    u = np.asarray(state["U"].data)
    k = np.asarray(state["turb"]["k"].data)
    nut = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(u).all() and np.isfinite(k).all()
    assert (k > 0).all() and (nut >= 0).all()
    # flow enters at 10 m/s; bounded acceleration through the nozzle
    assert np.abs(u).max() < 40.0
    # recirculation: negative x-velocity somewhere behind the step
    c = np.asarray(case.mesh.c)
    behind = (c[:, 0] > 0.0) & (c[:, 0] < 0.05) & (c[:, 1] < 0.0)
    assert u[behind, 0].min() < -0.01
    # turbulence developed in the shear layer
    assert nut.max() > 20 * 1e-5
