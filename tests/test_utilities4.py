"""Utility batch #4: mesh converters, surface tools, misc
(reference: applications/utilities/mesh/conversion/, surface/,
miscellaneous/, preProcessing/)."""

import os

import numpy as np
import pytest

from foamtpu.apps import meshutils4 as mu4
from foamtpu.apps.cli import COMMANDS
from foamtpu.io import polymesh as mesh_io
from foamtpu.mesh.gmsh import to_polymesh
from foamtpu.mesh.snappy import read_stl, write_stl


def _unit_cube_stl(path):
    """Closed unit-cube surface (12 tris, outward normals)."""
    quads = [  # (corner loop, ccw seen from outside)
        [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],   # z=0
        [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],   # z=1
        [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],   # y=0
        [(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)],   # y=1
        [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],   # x=0
        [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],   # x=1
    ]
    tris = []
    for q in quads:
        q = np.asarray(q, float)
        tris.append(q[[0, 1, 2]])
        tris.append(q[[0, 2, 3]])
    tris = np.asarray(tris)
    write_stl(path, tris)
    return tris


def test_tetgen_to_foam(tmp_path):
    base = str(tmp_path / "box")
    # single tetrahedron, 1-indexed nodes
    open(base + ".node", "w").write(
        "4 3 0 0\n1 0 0 0\n2 1 0 0\n3 0 1 0\n4 0 0 1\n")
    open(base + ".ele", "w").write("1 4 0\n1 1 2 3 4\n")
    pts, cells, surfs, phys = mu4.read_tetgen(base)
    pm = to_polymesh(pts, cells, surfs, phys)
    assert pm.n_cells == 1
    assert pm.n_faces == 4
    assert abs(float(pm.v.sum()) - 1.0 / 6.0) < 1e-12


def test_plot3d_to_foam(tmp_path):
    # 3x2x2 single-block grid -> 2 hex cells
    nx, ny, nz = 3, 2, 2
    xs, ys, zs = np.meshgrid(np.arange(nx) * 0.5, np.arange(ny),
                             np.arange(nz), indexing="ij")
    path = tmp_path / "grid.xyz"
    with open(path, "w") as f:
        f.write(f"{nx} {ny} {nz}\n")
        for arr in (xs, ys, zs):
            # PLOT3D whole format: i fastest (Fortran order)
            f.write(" ".join(f"{v:g}" for v in
                             arr.transpose(2, 1, 0).ravel()) + "\n")
    pts, cells, surfs, phys = mu4.read_plot3d(str(path))
    pm = to_polymesh(pts, cells, surfs, phys)
    assert pm.n_cells == 2
    assert abs(float(pm.v.sum()) - 1.0) < 1e-10


def test_msh_and_vtk_to_foam(tmp_path):
    # adventure msh: unit hex cell
    p = tmp_path / "box.msh"
    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
           (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    with open(p, "w") as f:
        f.write("8\n")
        for x in pts:
            f.write(f"{x[0]} {x[1]} {x[2]}\n")
        f.write("1\n0 1 2 3 4 5 6 7\n")
    pm = to_polymesh(*mu4.read_adventure_msh(str(p)))
    assert pm.n_cells == 1 and abs(float(pm.v.sum()) - 1.0) < 1e-12

    # legacy VTK with the same hex
    v = tmp_path / "box.vtk"
    with open(v, "w") as f:
        f.write("# vtk DataFile Version 2.0\nbox\nASCII\n"
                "DATASET UNSTRUCTURED_GRID\nPOINTS 8 float\n")
        for x in pts:
            f.write(f"{x[0]} {x[1]} {x[2]}\n")
        f.write("CELLS 1 9\n8 0 1 2 3 4 5 6 7\nCELL_TYPES 1\n12\n")
    pm2 = to_polymesh(*mu4.read_vtk_unstructured(str(v)))
    assert pm2.n_cells == 1 and abs(float(pm2.v.sum()) - 1.0) < 1e-12


def test_gambit_to_foam(tmp_path):
    p = tmp_path / "box.neu"
    with open(p, "w") as f:
        f.write("   NODAL COORDINATES 2.0.0\n")
        for i, x in enumerate([(0, 0, 0), (1, 0, 0), (1, 1, 0),
                               (0, 1, 0), (0, 0, 1), (1, 0, 1),
                               (1, 1, 1), (0, 1, 1)]):
            f.write(f"{i + 1} {x[0]:.6f} {x[1]:.6f} {x[2]:.6f}\n")
        f.write("ENDOFSECTION\n")
        f.write("   ELEMENTS/CELLS 2.0.0\n")
        # gambit brick node order maps via _GAMBIT_HEX
        f.write("1 4 8 1 2 4 3 5 6 8 7\n")
        f.write("ENDOFSECTION\n")
    pm = to_polymesh(*mu4.read_gambit(str(p)))
    assert pm.n_cells == 1
    assert abs(float(pm.v.sum()) - 1.0) < 1e-12


def test_ideas_unv_to_foam(tmp_path):
    p = tmp_path / "box.unv"
    nodes = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)]
    with open(p, "w") as f:
        f.write("    -1\n  2411\n")
        for i, x in enumerate(nodes):
            f.write(f"{i + 1} 1 1 11\n")
            f.write(f"{x[0]:.4E} {x[1]:.4E} {x[2]:.4E}\n")
        f.write("    -1\n    -1\n  2412\n")
        f.write("1 111 1 1 7 4\n1 2 3 4\n")
        f.write("    -1\n")
    pm = to_polymesh(*mu4.read_unv(str(p)))
    assert pm.n_cells == 1
    assert abs(float(pm.v.sum()) - 1.0 / 6.0) < 1e-10


def test_surface_clean_and_merge(tmp_path):
    stl = str(tmp_path / "cube.stl")
    tris = _unit_cube_stl(stl)
    # add a degenerate + duplicate triangle
    bad = np.concatenate([tris, tris[:1],
                          np.zeros((1, 3, 3))], axis=0)
    out = mu4.surface_clean(bad)
    assert out.shape[0] == 12
    pts, tri_idx = mu4.surface_merge_points(tris)
    assert pts.shape[0] == 8
    assert tri_idx.shape == (12, 3)


def test_surface_orient_and_inertia(tmp_path):
    stl = str(tmp_path / "cube.stl")
    tris = _unit_cube_stl(stl)
    # scramble orientations
    bad = tris.copy()
    bad[::2] = bad[::2][:, ::-1, :]
    fixed = mu4.surface_orient(bad, (10.0, 10.0, 10.0))
    vol, ctr, inertia = mu4.surface_inertia(fixed)
    assert abs(vol - 1.0) < 1e-12
    assert np.allclose(ctr, 0.5, atol=1e-12)
    # unit cube about centroid: I = m/6 diag (for unit mass density)
    assert np.allclose(np.diag(inertia), 1.0 / 6.0, atol=1e-9)
    assert np.allclose(inertia - np.diag(np.diag(inertia)), 0.0,
                       atol=1e-9)


def test_inside_cells_cmd(tmp_path, monkeypatch):
    case = tmp_path / "case"
    (case / "system").mkdir(parents=True)
    (case / "constant").mkdir()
    # 4x4x4 unit-cube mesh via blockMesh strings
    from foamtpu.apps.cases import CAVITY3D_BLOCKMESH
    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh

    pm = blockmesh.generate(parse_string(
        CAVITY3D_BLOCKMESH.replace("{n}", "4")))
    mesh_io.write(pm, str(case / "constant" / "polyMesh"))
    # surface: box enclosing the lower half (z < 0.05 of the 0.1 cube)
    stl = str(case / "half.stl")
    tris = _unit_cube_stl(stl)
    tris = tris * np.asarray([0.2, 0.2, 0.05]) \
        + np.asarray([-0.05, -0.05, -0.001])
    write_stl(stl, tris)
    rc = COMMANDS["insideCells"]([stl, "lower", "-case", str(case)])
    assert rc == 0
    from foamtpu.apps.meshutils import read_set

    ids = read_set(str(case), "lower")
    assert ids.size == 32  # half of the 64 cells


def test_expand_dictionary_and_info(tmp_path, capsys):
    f = tmp_path / "d"
    f.write_text("a 1;\nsub { b (1 2 3); }\n")
    assert COMMANDS["expandDictionary"]([str(f)]) == 0
    out = capsys.readouterr().out
    assert "a 1;" in out and "sub" in out
    assert COMMANDS["foamInfoExec"](
        ["-dictionary", str(f), "-entry", "sub.b"]) == 0
    out = capsys.readouterr().out
    assert "1" in out and "3" in out


def test_foam_upgrade_fv_solution(tmp_path):
    case = tmp_path / "case"
    (case / "system").mkdir(parents=True)
    (case / "system" / "fvSolution").write_text(
        "solvers\n{\n    p PCG\n    {\n        preconditioner DIC;\n"
        "        tolerance 1e-06;\n    }\n}\n")
    assert COMMANDS["foamUpgradeFvSolution"](["-case", str(case)]) == 0
    text = (case / "system" / "fvSolution").read_text()
    assert "solver PCG;" in text
    from foamtpu.core.dictionary import parse_string

    d = parse_string(text)
    assert str(d["solvers"]["p"]["solver"]) == "PCG"


def test_surface_mesh_triangulate_roundtrip(tmp_path):
    case = tmp_path / "case"
    (case / "constant").mkdir(parents=True)
    from foamtpu.apps.cases import CAVITY3D_BLOCKMESH
    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh

    pm = blockmesh.generate(parse_string(
        CAVITY3D_BLOCKMESH.replace("{n}", "3")))
    mesh_io.write(pm, str(case / "constant" / "polyMesh"))
    out = str(tmp_path / "bnd.stl")
    rc = COMMANDS["surfaceMeshTriangulate"]([out, "-case", str(case)])
    assert rc == 0
    tris = read_stl(out)
    # closed boundary of the cube: total area = 6 * 0.1^2
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert abs(area - 6 * 0.01) < 1e-8


def test_commands_registered():
    for name in ("tetgenToFoam", "ideasUnvToFoam", "plot3dToFoam",
                 "mshToFoam", "gambitToFoam", "vtkUnstructuredToFoam",
                 "surfaceAdd", "surfaceClean", "surfacePointMerge",
                 "surfaceOrient", "surfaceInertia",
                 "surfaceSplitByPatch", "surfaceMeshTriangulate",
                 "insideCells", "selectCells", "splitMesh",
                 "expandDictionary", "foamInfoExec", "patchSummary",
                 "steadyParticleTracks", "engineSwirl",
                 "foamUpgradeFvSolution", "dsmcInitialise",
                 "mdInitialise"):
        assert name in COMMANDS, name
