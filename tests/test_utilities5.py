"""Utility batch #5 (apps/meshutils5.py, apps/preputils.py; reference:
applications/utilities/mesh/conversion/{star4ToFoam,ansysToFoam,
datToFoam,foamMeshToFluent,foamToStarMesh}, manipulation/{rotateMesh,
zipUpMesh,removeFaces,singleCellMesh,moveMesh}, advanced/
{autoRefineMesh,refineHexMesh}, preProcessing/*, thermophysical/
{equilibriumFlameT,equilibriumCO}, postProcessing/dataConversion/)."""

import os

import numpy as np
import pytest

from foamtpu.apps.cli import COMMANDS, main
from foamtpu.io import polymesh as mesh_io

HDR = ("FoamFile { version 2.0; format ascii; class dictionary; "
       "object %s; }\n")

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (6 4 4) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""

CONTROL = """
application icoFoam;
startTime 0; endTime 1; deltaT 0.25;
writeControl timeStep; writeInterval 1;
"""


def _closed(pm):
    acc = np.zeros((pm.n_cells, 3))
    nif = pm.n_internal_faces
    np.add.at(acc, pm.owner[:nif], pm.sf[:nif])
    np.subtract.at(acc, pm.neighbour, pm.sf[:nif])
    np.add.at(acc, pm.owner[nif:], pm.sf[nif:])
    assert np.abs(acc).max() < 1e-10 * pm.mag_sf.max()


def _mk_case(tmp_path, name="c"):
    case = str(tmp_path / name)
    os.makedirs(os.path.join(case, "system"))
    os.makedirs(os.path.join(case, "constant"))
    with open(os.path.join(case, "system", "blockMeshDict"), "w") as f:
        f.write(HDR % "blockMeshDict" + BOX)
    with open(os.path.join(case, "system", "controlDict"), "w") as f:
        f.write(HDR % "controlDict" + CONTROL)
    with open(os.path.join(case, "system", "fvSchemes"), "w") as f:
        f.write(HDR % "fvSchemes" + """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default Gauss linear; }
laplacianSchemes { default Gauss linear corrected; }
""")
    with open(os.path.join(case, "system", "fvSolution"), "w") as f:
        f.write(HDR % "fvSolution" + "solvers { }\n")
    assert main(["blockMesh", "-case", case]) == 0
    return case


def _mdir(case):
    return os.path.join(case, "constant", "polyMesh")


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------


def test_star_round_trip(tmp_path):
    """foamToStarMesh -> star4ToFoam preserves cells and volume."""
    case = _mk_case(tmp_path)
    base = os.path.join(case, "export")
    assert main(["foamToStarMesh", base, "-case", case]) == 0
    case2 = str(tmp_path / "c2")
    os.makedirs(_mdir(case2))
    assert main(["star4ToFoam", base + ".vrt", "-case", case2]) == 0
    pm0 = mesh_io.read(_mdir(case))
    pm1 = mesh_io.read(_mdir(case2))
    assert pm1.n_cells == pm0.n_cells
    assert abs(float(pm1.v.sum()) - float(pm0.v.sum())) < 1e-10
    _closed(pm1)


def test_star_shapes():
    from foamtpu.apps.meshutils5 import _star_shape

    assert _star_shape([0, 1, 2, 3, 4, 5, 6, 7])[0] == 5    # hex
    assert _star_shape([0, 1, 2, 2, 3, 3, 3, 3]) == (4, [0, 1, 2, 3])
    assert _star_shape([0, 1, 2, 3, 4, 4, 4, 4]) == \
        (7, [0, 1, 2, 3, 4])                                 # pyramid
    assert _star_shape([0, 1, 2, 2, 3, 4, 5, 5]) == \
        (6, [0, 1, 2, 3, 4, 5])                              # prism


def test_ansys_to_foam(tmp_path):
    path = str(tmp_path / "box.ans")
    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
           (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    with open(path, "w") as f:
        for i, p in enumerate(pts):
            f.write(f"N,{i + 1},{p[0]},{p[1]},{p[2]}\n")
        f.write("EN,1,1,2,3,4,5,6,7,8\n")
    case = str(tmp_path / "c")
    os.makedirs(_mdir(case))
    assert main(["ansysToFoam", path, "-case", case]) == 0
    pm = mesh_io.read(_mdir(case))
    assert pm.n_cells == 1
    assert abs(float(pm.v.sum()) - 1.0) < 1e-12


def test_dat_to_foam(tmp_path):
    path = str(tmp_path / "grid.dat")
    xs = np.linspace(0, 1, 2)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    with open(path, "w") as f:
        f.write("2 2 2\n")
        for arr in (X, Y, Z):
            f.write(" ".join(f"{v:g}" for v in arr.ravel()) + "\n")
    case = str(tmp_path / "c")
    assert main(["datToFoam", path, "-case", case]) == 0
    txt = open(os.path.join(_mdir(case), "points")).read()
    assert "8" in txt and txt.count("(") >= 9


# ---------------------------------------------------------------------------
# exports
# ---------------------------------------------------------------------------


def test_foam_to_surface(tmp_path):
    from foamtpu.mesh.snappy import read_stl

    case = _mk_case(tmp_path)
    out = str(tmp_path / "bnd.stl")
    assert main(["foamToSurface", out, "-case", case]) == 0
    tris = read_stl(out)
    pm = mesh_io.read(_mdir(case))
    assert len(tris) == 2 * (pm.n_faces - pm.n_internal_faces)
    # closed surface: total area = 6 (unit cube)
    a = 0.5 * np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]),
        axis=1).sum()
    assert abs(a - 6.0) < 1e-9


def test_fluent_round_trip(tmp_path):
    case = _mk_case(tmp_path)
    out = str(tmp_path / "mesh.msh")
    assert main(["foamMeshToFluent", out, "-case", case]) == 0
    case2 = str(tmp_path / "c2")
    os.makedirs(_mdir(case2))
    assert main(["fluentMeshToFoam", out, "-case", case2]) == 0
    pm0 = mesh_io.read(_mdir(case))
    pm1 = mesh_io.read(_mdir(case2))
    assert pm1.n_cells == pm0.n_cells
    assert abs(float(pm1.v.sum()) - 1.0) < 1e-10
    _closed(pm1)


def test_tecplot_and_gmv_export(tmp_path):
    import jax.numpy as jnp

    from foamtpu.core.case import Case
    from foamtpu.core.fields import vol_scalar
    from foamtpu.io import fields as field_io

    case = _mk_case(tmp_path)
    c = Case(case)
    p = vol_scalar(c.mesh, 0.0, name="p").with_data(
        jnp.asarray(np.asarray(c.mesh.c)[:, 0]))
    field_io.write_field(p, c.mesh, case, "0")
    assert main(["foamToTecplot360", "-case", case, "-time", "0"]) == 0
    txt = open(os.path.join(case, "tecplot_0.dat")).read()
    assert "FEPOLYHEDRON" in txt and '"p"' in txt
    assert "ELEMENTS=96" in txt
    assert main(["foamToGMV", "-case", case, "-time", "0"]) == 0
    g = open(os.path.join(case, "gmv_0.gmv")).read()
    assert g.startswith("gmvinput") and "cells 96" in g and "p 0" in g


# ---------------------------------------------------------------------------
# manipulation
# ---------------------------------------------------------------------------


def test_rotate_mesh(tmp_path):
    case = _mk_case(tmp_path)
    pm0 = mesh_io.read(_mdir(case))
    assert main(["rotateMesh", "(1 0 0)", "(0 1 0)",
                 "-case", case]) == 0
    pm1 = mesh_io.read(_mdir(case))
    # x-axis maps to y-axis
    assert np.allclose(pm1.points[:, 1], pm0.points[:, 0], atol=1e-12)
    assert abs(float(pm1.v.sum()) - float(pm0.v.sum())) < 1e-10


def test_zip_up_mesh(tmp_path):
    case = _mk_case(tmp_path)
    pm0 = mesh_io.read(_mdir(case))
    n0 = len(pm0.points)
    # jitter points by < tol/2 so keys collide only for true dups,
    # then append an exact duplicate of point 0 (unreferenced)
    from foamtpu.mesh.core import PolyMesh

    pts = np.vstack([pm0.points, pm0.points[0]])
    pm = PolyMesh(points=pts, face_pts=pm0.face_pts,
                  face_npts=pm0.face_npts, owner=pm0.owner,
                  neighbour=pm0.neighbour, patches=pm0.patches)
    mesh_io.write(pm, _mdir(case))
    assert main(["zipUpMesh", "-case", case]) == 0
    pm1 = mesh_io.read(_mdir(case))
    assert len(pm1.points) == n0
    assert abs(float(pm1.v.sum()) - 1.0) < 1e-10
    _closed(pm1)


def test_remove_faces(tmp_path):
    case = _mk_case(tmp_path)
    pm0 = mesh_io.read(_mdir(case))
    plane = np.nonzero(np.abs(
        pm0.cf[:pm0.n_internal_faces, 0] - 0.5) < 1e-9)[0]
    assert plane.size == 16
    from foamtpu.apps.meshutils import write_set

    write_set(case, "cut", "faceSet", plane)
    assert main(["removeFaces", "cut", "-case", case]) == 0
    pm1 = mesh_io.read(_mdir(case))
    assert pm1.n_cells == pm0.n_cells - 16
    assert abs(float(pm1.v.sum()) - float(pm0.v.sum())) < 1e-10
    _closed(pm1)


def test_single_cell_mesh(tmp_path):
    import jax.numpy as jnp

    from foamtpu.core.case import Case
    from foamtpu.core.fields import vol_scalar
    from foamtpu.io import fields as field_io

    case = _mk_case(tmp_path)
    c = Case(case)
    xc = np.asarray(c.mesh.c)[:, 0]
    p = vol_scalar(c.mesh, 0.0, name="p").with_data(jnp.asarray(xc))
    field_io.write_field(p, c.mesh, case, "0")
    out = str(tmp_path / "one")
    assert main(["singleCellMesh", "-case", case, "-out", out]) == 0
    pm1 = mesh_io.read(_mdir(out))
    assert pm1.n_cells == 1
    from foamtpu.io import fields as field_io2

    pv = field_io2.read_field(os.path.join(out, "0", "p"), pm1,
                              name="p")
    val = float(np.asarray(pv.data).ravel()[0])
    assert abs(val - 0.5) < 1e-6          # volume average of x


def test_refine_hex_and_auto_refine(tmp_path):
    from foamtpu.apps.meshutils import write_set

    case = _mk_case(tmp_path)
    pm0 = mesh_io.read(_mdir(case))
    ids = np.nonzero(pm0.c[:, 0] < 1.0 / 6.0)[0]
    write_set(case, "left", "cellSet", ids)
    assert main(["refineHexMesh", "left", "-case", case]) == 0
    pm1 = mesh_io.read(_mdir(case))
    assert pm1.n_cells == pm0.n_cells + 7 * ids.size
    assert abs(float(pm1.v.sum()) - 1.0) < 1e-10
    _closed(pm1)


def test_auto_refine_mesh(tmp_path):
    from foamtpu.mesh.snappy import write_stl

    case = _mk_case(tmp_path)
    pm0 = mesh_io.read(_mdir(case))
    # small cube surface centred in the domain
    quads = [
        [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],
        [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
        [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],
        [(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)],
        [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],
        [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],
    ]
    tris = []
    for q in quads:
        q = 0.3 + 0.4 * np.asarray(q, float)
        tris.append(q[[0, 1, 2]])
        tris.append(q[[0, 2, 3]])
    stl = str(tmp_path / "inner.stl")
    write_stl(stl, np.asarray(tris))
    assert main(["autoRefineMesh", stl, "-case", case]) == 0
    pm1 = mesh_io.read(_mdir(case))
    assert pm1.n_cells > pm0.n_cells
    assert abs(float(pm1.v.sum()) - 1.0) < 1e-10


def test_move_mesh(tmp_path):
    case = _mk_case(tmp_path)
    with open(os.path.join(case, "constant", "dynamicMeshDict"),
              "w") as f:
        f.write(HDR % "dynamicMeshDict" + """
dynamicFvMesh solidBodyMotionFvMesh;
solidBodyMotionFvMeshCoeffs
{
    solidBodyMotionFunction linearMotion;
    linearMotionCoeffs { velocity (1 0 0); }
}
""")
    assert main(["moveMesh", "-case", case]) == 0
    moved = os.path.join(case, "1", "polyMesh")
    assert os.path.isdir(moved)
    pm1 = mesh_io.read(moved)
    pm0 = mesh_io.read(_mdir(case))
    assert np.allclose(pm1.points[:, 0], pm0.points[:, 0] + 1.0,
                       atol=1e-9)


# ---------------------------------------------------------------------------
# preProcessing
# ---------------------------------------------------------------------------


def test_apply_wall_function_bcs(tmp_path):
    from foamtpu.core.dictionary import parse_file

    case = _mk_case(tmp_path)
    os.makedirs(os.path.join(case, "0"), exist_ok=True)
    for f, cls in (("k", "volScalarField"),
                   ("nut", "volScalarField")):
        with open(os.path.join(case, "0", f), "w") as fh:
            fh.write(HDR % f + """
dimensions [0 2 -2 0 0 0 0];
internalField uniform 0.1;
boundaryField { walls { type fixedValue; value uniform 0.1; } }
""")
    assert main(["applyWallFunctionBoundaryConditions",
                 "-case", case]) == 0
    d = parse_file(os.path.join(case, "0", "k"))
    assert str(d["boundaryField"]["walls"]["type"]) == \
        "kqRWallFunction"
    d = parse_file(os.path.join(case, "0", "nut"))
    assert str(d["boundaryField"]["walls"]["type"]) == \
        "nutkWallFunction"


def test_wall_function_table(tmp_path):
    case = _mk_case(tmp_path)
    assert main(["wallFunctionTable", "-case", case]) == 0
    rows = [ln.split() for ln in
            open(os.path.join(case, "constant", "wallFunctionTable"))
            if not ln.startswith("//")]
    yp = np.asarray([float(r[0]) for r in rows])
    up = np.asarray([float(r[1]) for r in rows])
    assert np.all(np.diff(up) > 0)            # monotone
    assert abs(up[0] - yp[0]) < 0.05 * yp[0]  # viscous sublayer: u+=y+
    k, E = 0.41, 9.8
    assert abs(up[-1] - np.log(E * yp[-1]) / k) < 0.5   # log law


def test_face_agglomerate_and_viewfactors(tmp_path):
    case = _mk_case(tmp_path)
    assert main(["faceAgglomerate", "-case", case,
                 "-nCoarse", "4"]) == 0
    assert os.path.exists(os.path.join(case, "constant",
                                       "faceAgglomeration"))
    assert main(["viewFactorsGen", "-case", case]) == 0
    txt = open(os.path.join(case, "constant", "F")).read()
    rows = [ln for ln in txt.splitlines()
            if ln.startswith("(") and len(ln) > 2]
    F = np.asarray([[float(v) for v in
                     ln.strip("()").split()] for ln in rows])
    # closed box: every row sums to 1
    assert np.allclose(F.sum(axis=1), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# equilibrium thermo
# ---------------------------------------------------------------------------

_SP = """
%s
{
    specie { nMoles 1; molWeight %s; }
    thermodynamics
    {
        Tlow 200; Thigh 3500; Tcommon 1000;
        highCpCoeffs ( %s );
        lowCpCoeffs ( %s );
    }
}
"""

# GRI-Mech 3.0 NASA-7 coefficients
_THERMO = (
    _SP % ("CH4", "16.043",
           "7.48514950E-02 1.33909467E-02 -5.73285809E-06 "
           "1.22292535E-09 -1.01815230E-13 -9.46834459E+03 "
           "1.84373180E+01",
           "5.14987613E+00 -1.36709788E-02 4.91800599E-05 "
           "-4.84743026E-08 1.66693956E-11 -1.02466476E+04 "
           "-4.64130376E+00")
    + _SP % ("O2", "31.9988",
             "3.28253784E+00 1.48308754E-03 -7.57966669E-07 "
             "2.09470555E-10 -2.16717794E-14 -1.08845772E+03 "
             "5.45323129E+00",
             "3.78245636E+00 -2.99673416E-03 9.84730201E-06 "
             "-9.68129509E-09 3.24372837E-12 -1.06394356E+03 "
             "3.65767573E+00")
    + _SP % ("N2", "28.0134",
             "2.92664000E+00 1.48797680E-03 -5.68476000E-07 "
             "1.00970380E-10 -6.75335100E-15 -9.22797700E+02 "
             "5.98052800E+00",
             "3.29867700E+00 1.40824040E-03 -3.96322200E-06 "
             "5.64151500E-09 -2.44485400E-12 -1.02089990E+03 "
             "3.95037200E+00")
    + _SP % ("CO2", "44.0095",
             "3.85746029E+00 4.41437026E-03 -2.21481404E-06 "
             "5.23490188E-10 -4.72084164E-14 -4.87591660E+04 "
             "2.27163806E+00",
             "2.35677352E+00 8.98459677E-03 -7.12356269E-06 "
             "2.45919022E-09 -1.43699548E-13 -4.83719697E+04 "
             "9.90105222E+00")
    + _SP % ("H2O", "18.0153",
             "3.03399249E+00 2.17691804E-03 -1.64072518E-07 "
             "-9.70419870E-11 1.68200992E-14 -3.00042971E+04 "
             "4.96677010E+00",
             "4.19864056E+00 -2.03643410E-03 6.52040211E-06 "
             "-5.48797062E-09 1.77197817E-12 -3.02937267E+04 "
             "-8.49032208E-01")
    + _SP % ("CO", "28.0101",
             "2.71518561E+00 2.06252743E-03 -9.98825771E-07 "
             "2.30053008E-10 -2.03647716E-14 -1.41518724E+04 "
             "7.81868772E+00",
             "3.57953347E+00 -6.10353680E-04 1.01681433E-06 "
             "9.07005884E-10 -9.04424499E-13 -1.43440860E+04 "
             "3.50840928E+00")
    + _SP % ("H2", "2.01594",
             "3.33727920E+00 -4.94024731E-05 4.99456778E-07 "
             "-1.79566394E-10 2.00255376E-14 -9.50158922E+02 "
             "-3.20502331E+00",
             "2.34433112E+00 7.98052075E-03 -1.94781510E-05 "
             "2.01572094E-08 -7.37611761E-12 -9.17935173E+02 "
             "6.83010238E-01")
)


def _thermo_case(tmp_path):
    case = str(tmp_path / "t")
    os.makedirs(os.path.join(case, "constant"))
    with open(os.path.join(case, "constant",
                           "thermo.compressibleGas"), "w") as f:
        f.write(HDR % "thermo" + _THERMO)
    with open(os.path.join(case, "flameControl"), "w") as f:
        f.write(HDR % "flameControl" + """
thermo constant/thermo.compressibleGas;
T0 298.15;
reactants { CH4 1; O2 2; N2 7.52; }
products  { CO2 1; H2O 2; N2 7.52; O2 0; }
""")
    return case


def test_equilibrium_kp_increases_with_T(tmp_path):
    from foamtpu.apps import preputils as pu
    from foamtpu.core.dictionary import parse_string

    thermo = parse_string(_THERMO)
    k1, k2 = pu.kp_co2(thermo, 2000.0), pu.kp_co2(thermo, 3000.0)
    assert k2 > k1 > 0
    # textbook: Kp(CO2->CO+1/2 O2) ~ 1e-3 atm^1/2 at 2000 K
    assert 1e-4 < k1 < 1e-2


def test_equilibrium_flame_t(tmp_path, capsys):
    case = _thermo_case(tmp_path)
    assert main(["equilibriumFlameT",
                 os.path.join(case, "flameControl"),
                 "-case", case]) == 0
    out = capsys.readouterr().out
    T = float(out.split("=")[1].split("K")[0])
    # dissociation pulls stoichiometric CH4-air below the frozen
    # 2325 K value (textbook equilibrium Tad ~ 2220-2260 K)
    assert 2100.0 < T < 2320.0


def test_equilibrium_co(tmp_path, capsys):
    case = _thermo_case(tmp_path)
    assert main(["equilibriumCO", os.path.join(case, "flameControl"),
                 "-case", case, "-Tlow", "1500", "-Thigh", "3000",
                 "-nT", "4"]) == 0
    out = capsys.readouterr().out
    rows = [ln.split() for ln in out.splitlines()
            if ln.strip() and ln.strip()[0].isdigit()]
    xi = [float(r[2]) for r in rows]
    assert all(b >= a for a, b in zip(xi, xi[1:]))   # more CO when hot
    assert xi[0] < 0.01 and xi[-1] > 0.05


def test_create_turbulence_fields(tmp_path):
    import jax.numpy as jnp

    from foamtpu.core.case import Case
    from foamtpu.core.dimensions import DimensionSet
    from foamtpu.core.fields import vol_scalar, vol_vector
    from foamtpu.io import fields as field_io

    case = _mk_case(tmp_path)
    c = Case(case)
    mesh = c.mesh
    k = vol_scalar(mesh, 0.5, name="k",
                   dims=DimensionSet.of(0, 2, -2))
    eps = vol_scalar(mesh, 2.0, name="epsilon",
                     dims=DimensionSet.of(0, 2, -3))
    nut = vol_scalar(mesh, 1e-3, name="nut",
                     dims=DimensionSet.of(0, 2, -1))
    U = vol_vector(mesh, (1.0, 0.0, 0.0), name="U",
                   dims=DimensionSet.of(0, 1, -1))
    for f in (k, eps, nut, U):
        field_io.write_field(f, mesh, case, "0")
    assert main(["createTurbulenceFields", "-case", case,
                 "-time", "0"]) == 0
    om = c.read_field("omega", time="0")
    assert np.allclose(np.asarray(om.data), 2.0 / (0.09 * 0.5),
                       rtol=1e-6)
    assert os.path.exists(os.path.join(case, "0", "Rxx"))
