"""coded functionObject (functionobjects/misc.py::Coded; reference:
the codedFunctionObject `coded` type + db/dynamicLibrary/codedBase —
wmake-compiled C++ snippet there, Python snippet here)."""

import os
import shutil

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FUNCS = """
functions
{
    maxU
    {
        type coded;
        name maxU;
        codeExecute #{
umax = float(jnp.max(jnp.linalg.norm(state["U"].data, axis=1)))
store["n"] = store.get("n", 0) + 1
output(f"{time_name}\\t{umax:.6g}")
        #};
    }
}
"""


def test_coded_function_object_runs_and_writes(tmp_path):
    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    dst = str(tmp_path / "cavity")
    shutil.copytree(src, dst)
    cd = os.path.join(dst, "system", "controlDict")
    with open(cd) as f:
        txt = f.read()
    with open(cd, "w") as f:
        f.write(txt + FUNCS)
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", dst]) == 0
    run_case(dst, max_steps=4)
    dat = os.path.join(dst, "postProcessing", "maxU", "0", "maxU.dat")
    assert os.path.exists(dat)
    rows = [ln.split("\t") for ln in open(dat).read().splitlines() if ln]
    assert len(rows) >= 4
    vals = np.asarray([float(r[1]) for r in rows])
    # lid-driven cavity: |U|max approaches the lid speed (1 m/s)
    assert 0.5 < vals[-1] <= 1.2
