"""fanDuct tutorial: createBaffles cyclic pair + fan jump BC drives
flow through an open duct (reference workflow: topoSet ->
createBaffles -> pimpleFoam with fvPatchFields/derived/fan)."""

import os
import shutil

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fan_drives_duct_flow(tmp_path):
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    src = os.path.join(REPO, "tutorials", "incompressible",
                       "pimpleFoam", "fanDuct")
    case = str(tmp_path / "fanDuct")
    shutil.copytree(src, case)
    assert main(["blockMesh", "-case", case]) == 0
    assert main(["topoSet", "-case", case]) == 0
    assert main(["createBaffles", "-case", case]) == 0
    c = run_case(case, max_steps=60)
    U = np.asarray(c.final_state["U"].data)
    p = np.asarray(c.final_state["p"].data)
    x = np.asarray(c.mesh.c)[:, 0]
    assert np.isfinite(U).all() and np.isfinite(p).all()
    # the fan (curve jump = 0.05 - Q) blows master -> slave (+x)
    assert U[:, 0].mean() > 1e-3
    # suction upstream, pressure recovery downstream
    assert p[x > 1.0].mean() > p[x < 1.0].mean() + 0.01
