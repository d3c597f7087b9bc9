"""fieldValues / systemCall / abortCalculation / nearWallFields
function objects (functionobjects/values.py; reference:
src/postProcessing/functionObjects/{field/fieldValues,utilities/
systemCall,jobControl/abortCalculation,field/nearWallFields})."""

import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FUNCS = """
functions
{
    pAvg
    {
        type        fieldValues;
        source      all;
        operation   volAverage;
        fields      ( p U );
    }
    lidP
    {
        type        faceSource;
        sourceName  movingWall;
        operation   areaAverage;
        fields      ( p );
    }
    marker
    {
        type        systemCall;
        executeCalls ( "touch syscall.mark" );
    }
    stopper
    {
        type        abortCalculation;
        fileName    ABORT;
    }
    wallU
    {
        type        nearWallFields;
        fields      ( (U UNear) );
        patches     ( fixedWalls );
    }
}
"""


@pytest.fixture()
def cavity_funcs(tmp_path):
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

    assert main(["blockMesh", "-case", dst]) == 0
    return dst


def test_field_values_and_calls(cavity_funcs):
    from foamtpu.core.case import Case, run_case

    cwd = os.getcwd()
    os.chdir(cavity_funcs)
    try:
        case = run_case(cavity_funcs, max_steps=4)
    finally:
        os.chdir(cwd)
    # cellSource volAverage series
    dat = os.path.join(cavity_funcs, "postProcessing", "pAvg",
                       "fieldValue.dat")
    lines = [l for l in open(dat) if not l.startswith("#")]
    assert len(lines) >= 4
    # volAverage(p) finite; U column is a vector triple
    last = lines[-1].split()
    assert np.isfinite(float(last[1]))
    assert "(" in lines[-1]
    # faceSource on the lid
    fdat = os.path.join(cavity_funcs, "postProcessing", "lidP",
                        "faceSource.dat")
    flines = [l for l in open(fdat) if not l.startswith("#")]
    assert len(flines) >= 4
    # systemCall ran in the case cwd
    assert os.path.exists(os.path.join(cavity_funcs, "syscall.mark"))
    # nearWallFields wrote UNear at the final write
    t = case.latest_time_name()
    un = np.asarray(case.read_field("UNear", time=t).data)
    mesh = case.mesh
    own = set()
    for p in mesh.patches:
        if p.name == "fixedWalls":
            own.update(np.asarray(mesh.owner[p.slice]).tolist())
    inner = np.setdiff1d(np.arange(mesh.n_cells), sorted(own))
    assert np.abs(un[inner]).max() == 0.0
    assert np.abs(un[sorted(own)]).sum() > 0.0


def test_abort_calculation(cavity_funcs):
    from foamtpu.core.case import run_case

    open(os.path.join(cavity_funcs, "ABORT"), "w").close()
    case = run_case(cavity_funcs, max_steps=50)
    # stopped long before 50 steps (trigger checked at the first hook)
    assert case.time.index < 10
