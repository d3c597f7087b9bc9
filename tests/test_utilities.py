"""Utility-layer tests: foamLog parsing, transport models,
function-object math, partitioner."""

import numpy as np

import jax.numpy as jnp


def test_foamlog_roundtrip(tmp_path):
    from foamtpu.utils import foamlog

    log = """
Time = 0.005

Courant Number mean: 0.1 max: 0.85
Solving for Ux, Initial residual = 1, Final residual = 9.7e-06, No Iterations 12
Solving for p, Initial residual = 1, Final residual = 8.2e-07, No Iterations 35
Solving for p, Initial residual = 0.02, Final residual = 6e-07, No Iterations 20
time step continuity errors : sum local = 1.2e-08, global = -3e-10, cumulative = -3e-10

Time = 0.01

Courant Number mean: 0.11 max: 0.9
Solving for Ux, Initial residual = 0.4, Final residual = 5e-06, No Iterations 10
Solving for p, Initial residual = 0.5, Final residual = 7e-07, No Iterations 30
"""
    series = foamlog.parse(log)
    assert series["Ux"] == [(0.005, 1.0), (0.01, 0.4)]
    assert series["p"][1] == (0.01, 0.5)
    assert series["p_1"] == [(0.005, 0.02)]  # second p solve in the step
    assert series["CourantMax"] == [(0.005, 0.85), (0.01, 0.9)]
    p = tmp_path / "log.icoFoam"
    p.write_text(log)
    out = foamlog.write_logs(str(p))
    import os

    assert os.path.exists(os.path.join(out, "p"))


def test_transport_models():
    from foamtpu.core.dictionary import parse_string
    from foamtpu.core.fields import vol_vector
    from foamtpu.mesh import to_device
    from foamtpu.models import transport

    from test_blockmesh import cavity_mesh

    mesh = to_device(cavity_mesh(6))
    # shear field: u = (y, 0, 0)
    c = np.asarray(mesh.c)
    U = vol_vector(mesh, jnp.zeros(3)).with_data(
        jnp.asarray(np.stack([c[:, 1], 0 * c[:, 1], 0 * c[:, 1]], 1),
                    mesh.v.dtype))

    d = parse_string("""
transportModel  powerLaw;
powerLawCoeffs { k k [0 2 -1 0 0 0 0] 1e-3; n n [0 0 0 0 0 0 0] 0.6;
                 nuMin nuMin [0 2 -1 0 0 0 0] 1e-6;
                 nuMax nuMax [0 2 -1 0 0 0 0] 1e-2; }
""")
    nu = transport.select(d)(mesh, U)
    arr = np.asarray(nu)
    assert (arr >= 1e-6 - 1e-12).all() and (arr <= 1e-2 + 1e-12).all()
    # shear-thinning: nu finite and below nuMax for shear rate ~1
    assert np.isfinite(arr).all()

    d2 = parse_string("transportModel Newtonian; nu nu [0 2 -1 0 0 0 0] 0.01;")
    nu2 = np.asarray(transport.select(d2)(mesh, U))
    np.testing.assert_allclose(nu2, 0.01)


def test_vorticity_q():
    from foamtpu.core.fields import vol_vector
    from foamtpu.functionobjects.field import q_criterion, vorticity
    from foamtpu.mesh import to_device

    from test_blockmesh import cavity_mesh

    mesh = to_device(cavity_mesh(8))
    # rigid rotation u = (-y, x, 0): vorticity = (0,0,2), Q > 0
    c = np.asarray(mesh.c) - np.array([0.05, 0.05, 0.005])
    U = vol_vector(mesh, jnp.zeros(3)).with_data(
        jnp.asarray(np.stack([-c[:, 1], c[:, 0], 0 * c[:, 0]], 1),
                    mesh.v.dtype))
    w = np.asarray(vorticity(mesh, U))
    # interior cells: boundary zero-gradient pollutes the rim
    interior = (np.abs(c[:, 0]) < 0.03) & (np.abs(c[:, 1]) < 0.03)
    np.testing.assert_allclose(w[interior, 2], 2.0, atol=0.05)
    q = np.asarray(q_criterion(mesh, U))
    assert (q[interior] > 0).all()


def test_partitioner():
    from foamtpu.mesh import to_device
    from foamtpu.parallel import partition

    from test_blockmesh import cavity_mesh

    poly = cavity_mesh(16)
    parts = partition.decompose(poly, 4)
    counts = np.bincount(parts, minlength=4)
    assert counts.min() >= 60 and counts.max() <= 68  # balanced
    cut = partition.cut_faces(poly, parts)
    assert cut <= 3 * 16  # compact partitions, not random


def test_new_utilities_roundtrip(tmp_path):
    """foamListTimes / transformPoints / writeCellCentres / foamCalc /
    patchAverage / mapFields on a small cavity run."""
    import os
    import shutil

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import numpy as np

    from foamtpu.apps.cli import main

    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    case = str(tmp_path / "cavity")
    shutil.copytree(src, case)
    assert main(["blockMesh", "-case", case]) == 0
    assert main(["run", "-case", case, "-steps", "8"]) == 0

    # foamListTimes: at least one written time
    import io as _io
    import contextlib

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["foamListTimes", "-case", case]) == 0
    times = [l for l in buf.getvalue().split() if l]
    assert times

    # foamCalc mag + components at latest time
    assert main(["foamCalc", "mag", "U", "-case", case]) == 0
    assert main(["foamCalc", "components", "U", "-case", case]) == 0
    from foamtpu.core.case import Case

    c = Case(case)
    t = c.latest_time_name()
    magU = np.asarray(c.read_field("mag(U)", time=t).data)
    Ux = np.asarray(c.read_field("Ux", time=t).data)
    U = np.asarray(c.read_field("U", time=t).data)
    assert np.allclose(magU, np.linalg.norm(U, axis=1), atol=1e-6)
    assert np.allclose(Ux, U[:, 0], atol=1e-6)

    # patchAverage on the moving wall
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["patchAverage", "p", "movingWall", "-case",
                     case]) == 0
    assert "Average of p" in buf.getvalue()

    # writeCellCentres
    assert main(["writeCellCentres", "-case", case]) == 0
    ccx = np.asarray(c.read_field("ccx").data)
    assert np.allclose(ccx, np.asarray(c.mesh.c)[:, 0], atol=1e-7)

    # mapFields onto a finer cavity
    fine = str(tmp_path / "cavityFine")
    shutil.copytree(src, fine)
    bmd = os.path.join(fine, "constant", "polyMesh", "blockMeshDict")
    txt = open(bmd).read().replace("(20 20 1)", "(32 32 1)")
    open(bmd, "w").write(txt)
    assert main(["blockMesh", "-case", fine]) == 0
    assert main(["mapFields", case, "-case", fine,
                 "-sourceTime", t]) == 0
    cf = Case(fine)
    Uf = np.asarray(cf.read_field("U").data)
    assert Uf.shape[0] == 32 * 32
    assert abs(np.abs(Uf).max() - np.abs(U).max()) < 0.2

    # transformPoints: translate then verify centres moved
    assert main(["transformPoints", "-case", case,
                 "-translate", "(1 0 0)"]) == 0
    c2 = Case(case)
    assert abs(np.asarray(c2.mesh.c)[:, 0].min() - 1.0) < 0.01


def test_postprocess_utility(tmp_path):
    """postProcess re-runs function objects over saved time dirs."""
    import os
    import shutil

    import numpy as np

    from foamtpu.apps.cli import main

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    case = str(tmp_path / "cavity")
    shutil.copytree(src, case)
    # add a fieldMinMax function and a short run that writes one time
    cd = os.path.join(case, "system", "controlDict")
    txt = open(cd).read()
    txt += """
functions
{
    minmax { type fieldMinMax; fields (U p); }
}
"""
    open(cd, "w").write(txt)
    assert main(["blockMesh", "-case", case]) == 0
    assert main(["run", "-case", case, "-steps", "20"]) == 0
    out = os.path.join(case, "postProcessing", "minmax")
    shutil.rmtree(out, ignore_errors=True)
    assert main(["postProcess", "-case", case]) == 0
    files = []
    for root, _, fs in os.walk(out):
        files += [os.path.join(root, f) for f in fs]
    assert files, "postProcess wrote nothing"
    assert any(os.path.getsize(f) > 0 for f in files)
