"""Misc function objects batch 3 (functionobjects/misc.py; reference:
src/postProcessing/functionObjects/{field/readFields,
field/surfaceInterpolateFields,field/regionSizeDistribution,
field/fieldCoordinateSystemTransform,utilities/CourantNo,
utilities/writeDictionary,utilities/timeActivatedFileUpdate})."""

import glob
import os
import shutil

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FUNCS = """
functions
{
    co       { type CourantNo; }
    surf     { type surfaceInterpolateFields; fields ( p ); }
    xform
    {
        type fieldCoordinateSystemTransform;
        fields ( U );
        coordinateSystem { e1 (0 1 0); e3 (0 0 1); }
    }
    dicts    { type writeDictionary; dictNames ( transportProperties ); }
    blobs
    {
        type regionSizeDistribution;
        field p; threshold 1e30;    // no region exceeds: count 0
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


def test_misc_function_objects(cavity_funcs):
    from foamtpu.core.case import run_case

    cwd = os.getcwd()
    os.chdir(cavity_funcs)
    try:
        case = run_case(cavity_funcs, max_steps=4)
    finally:
        os.chdir(cwd)
    pp = os.path.join(cavity_funcs, "postProcessing")
    # CourantNo series: finite positive max
    lines = [l for l in open(os.path.join(pp, "co", "CourantNo.dat"))
             if not l.startswith("#")]
    assert len(lines) >= 3
    mx = float(lines[-1].split()[2])
    assert np.isfinite(mx) and mx > 0.0
    # surfaceInterpolateFields: one file per execute with nIf rows
    sf = sorted(glob.glob(os.path.join(pp, "surf", "pNear_*.dat")))
    assert sf
    rows = np.loadtxt(sf[-1])
    assert rows.shape[0] == int(case.mesh.n_internal_faces)
    # coordinate transform: U rotated into (e1=y, e2=-x? e3=z) frame —
    # column 0 of output = U.e1 = Uy
    xf = sorted(glob.glob(os.path.join(pp, "xform",
                                       "UTransformed_*.dat")))
    loc = np.loadtxt(xf[-1])
    U = np.asarray(case.read_field(
        "U", time=case.latest_time_name()).data)
    assert np.allclose(loc[:, 0], U[:, 1], atol=1e-6)
    # writeDictionary logged the transportProperties nu entry
    log = open(os.path.join(pp, "dicts", "dictionaries.log")).read()
    assert "nu" in log
    # regionSizeDistribution: threshold nothing -> zero regions
    blob = [l for l in open(os.path.join(pp, "blobs",
                                         "distribution.dat"))]
    assert blob and blob[-1].split()[1] == "0"


def test_region_size_distribution_counts(tmp_path):
    """Two disjoint alpha=1 blobs -> 2 regions with correct volumes."""
    from foamtpu.apps.cases import make_cavity
    from foamtpu.core.dictionary import parse_string
    from foamtpu.core.fields import vol_scalar
    from foamtpu.functionobjects.misc import RegionSizeDistribution
    import jax.numpy as jnp

    mesh, state, cfg = make_cavity(8)

    class FakeCase:
        dir = str(tmp_path)
        mesh = None

    FakeCase.mesh = mesh
    spec = parse_string("field alpha1; threshold 0.5; nBins 4;")
    fo = RegionSizeDistribution("blobs", spec, FakeCase)
    c = np.asarray(mesh.c)
    x = (c[:, 0] - c[:, 0].min()) / (c[:, 0].max() - c[:, 0].min())
    a = ((x < 0.25) | (x > 0.75)).astype(float)
    alpha = vol_scalar(mesh, 0.0, name="alpha1").with_data(
        jnp.asarray(a))
    fo.execute("0.1", {"alpha1": alpha})
    line = open(os.path.join(str(tmp_path), "postProcessing", "blobs",
                             "distribution.dat")).read().split()
    assert line[1] == "2"


def test_read_fields_and_time_activated(tmp_path):
    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    dst = str(tmp_path / "cavity")
    shutil.copytree(src, dst)
    staged = os.path.join(dst, "newTransport")
    shutil.copyfile(os.path.join(dst, "constant",
                                 "transportProperties"), staged)
    with open(staged, "a") as f:
        f.write("\n// swapped\n")
    cd = os.path.join(dst, "system", "controlDict")
    with open(cd) as f:
        txt = f.read()
    with open(cd, "w") as f:
        f.write(txt + """
functions
{
    rf  { type readFields; fields ( p ); }
    swp
    {
        type timeActivatedFileUpdate;
        fileToUpdate "$FOAM_CASE/constant/transportProperties";
        timeVsFile ( (0.002 "$FOAM_CASE/newTransport") );
    }
}
""")
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", dst]) == 0
    run_case(dst, max_steps=4)
    swapped = open(os.path.join(dst, "constant",
                                "transportProperties")).read()
    assert "// swapped" in swapped
