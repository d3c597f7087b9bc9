"""Mesh-manipulation utility batch 2 (reference: applications/
utilities/mesh/manipulation/): mirrorMesh, subsetMesh, mergeMeshes,
flattenMesh, autoPatch."""

import os

import numpy as np
import pytest

from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh, to_device
from foamtpu.apps import meshutils2

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (4 4 4) simpleGrading (1 1 1) );
boundary
(
    right { type patch; faces ((2 6 5 1)); }
    left  { type wall; faces ((0 4 7 3)); }
    rest  { type wall; faces ((1 5 4 0) (3 7 6 2) (0 3 2 1)
                              (4 5 6 7)); }
);
"""


def _pm():
    return blockmesh.generate(parse_string(BOX))


def _check(pm):
    """Basic validity: positive volumes, closed cells (sum Sf ~ 0)."""
    assert pm.v.min() > 0
    acc = np.zeros((pm.n_cells, 3))
    nif = pm.n_internal_faces
    np.add.at(acc, pm.owner[:nif], pm.sf[:nif])
    np.subtract.at(acc, pm.neighbour, pm.sf[:nif])
    np.add.at(acc, pm.owner[nif:], pm.sf[nif:])
    assert np.abs(acc).max() < 1e-10 * pm.mag_sf.max()


def test_mirror_mesh_doubles_volume():
    pm = _pm()
    out = meshutils2.mirror_mesh(pm, point=(1.0, 0, 0),
                                 normal=(1.0, 0, 0))
    _check(out)
    assert out.n_cells == 2 * pm.n_cells
    assert abs(out.v.sum() - 2 * pm.v.sum()) < 1e-10
    # the mirror-plane patch faces were fused: the `right` patch is gone
    right = [p for p in out.patches if p.name == "right"][0]
    assert right.size == 0
    # mirrored geometry spans [0, 2]
    assert out.points[:, 0].max() > 1.99


def test_subset_mesh_extracts_half():
    pm = _pm()
    cells = np.where(pm.c[:, 0] < 0.5)[0]
    out = meshutils2.subset_mesh(pm, cells)
    _check(out)
    assert out.n_cells == len(cells)
    assert abs(out.v.sum() - pm.v[cells].sum()) < 1e-12
    exp = [p for p in out.patches if p.name == "oldInternalFaces"][0]
    assert exp.size == 16           # the cut plane: 4x4 faces


def test_merge_meshes_concatenates():
    pm1 = _pm()
    d2 = parse_string(BOX.replace("(0 0 0) (1 0 0) (1 1 0) (0 1 0)",
                                  "(2 0 0) (3 0 0) (3 1 0) (2 1 0)")
                      .replace("(0 0 1) (1 0 1) (1 1 1) (0 1 1)",
                               "(2 0 1) (3 0 1) (3 1 1) (2 1 1)"))
    pm2 = blockmesh.generate(d2)
    out = meshutils2.merge_meshes(pm1, pm2)
    _check(out)
    assert out.n_cells == pm1.n_cells + pm2.n_cells
    assert abs(out.v.sum() - pm1.v.sum() - pm2.v.sum()) < 1e-10
    names = [p.name for p in out.patches]
    assert "right" in names and "right_1" in names


def test_flatten_and_autopatch():
    TWO_D = BOX.replace("(4 4 4)", "(4 4 1)").replace(
        """    right { type patch; faces ((2 6 5 1)); }
    left  { type wall; faces ((0 4 7 3)); }
    rest  { type wall; faces ((1 5 4 0) (3 7 6 2) (0 3 2 1)
                              (4 5 6 7)); }""",
        """    sides { type wall; faces ((2 6 5 1) (0 4 7 3)
                              (1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }""")
    pm = blockmesh.generate(parse_string(TWO_D))
    # perturb the z coordinates slightly, flatten restores them
    pm2 = meshutils2.flatten_mesh(pm)
    z = np.unique(np.round(pm2.points[:, 2], 12))
    assert len(z) == 2
    # autoPatch on the 3D cube splits the boundary into the 6 planes
    pm3 = _pm()
    out = meshutils2.auto_patch(pm3, 45.0)
    _check(out)
    assert len(out.patches) == 6
    assert sum(p.size for p in out.patches) == pm3.n_boundary_faces


def test_cli_roundtrip(tmp_path):
    """subsetMesh through the CLI: topoSet writes the set, subsetMesh
    consumes it, checkMesh passes on the result."""
    case = os.path.join(str(tmp_path), "c")
    os.makedirs(os.path.join(case, "system"), exist_ok=True)
    os.makedirs(os.path.join(case, "constant", "polyMesh"),
                exist_ok=True)
    hdr = ("FoamFile { version 2.0; format ascii; class dictionary; "
           "object x; }\n")
    with open(os.path.join(case, "constant", "polyMesh",
                           "blockMeshDict"), "w") as f:
        f.write(hdr + BOX)
    with open(os.path.join(case, "system", "topoSetDict"), "w") as f:
        f.write(hdr + """
actions
(
    { name half; type cellSet; action new; source boxToCell;
      sourceInfo { box (0 0 0) (0.5 1 1); } }
);
""")
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["topoSet", "-case", case]) == 0
    assert main(["subsetMesh", "half", "-case", case]) == 0
    assert main(["checkMesh", "-case", case]) == 0


def test_decompose_methods():
    """simple/hierarchical/manual decomposition methods (reference:
    src/parallel/decompose/): balanced parts, manual round-trip."""
    from foamtpu.parallel import partition

    pm = _pm()          # 4x4x4 = 64 cells
    p_simple = partition.decompose(pm, 4, method="simple",
                                   coeffs={"n": (4, 1, 1)})
    assert p_simple.max() == 3
    assert np.bincount(p_simple).tolist() == [16, 16, 16, 16]
    # simple slabs along x: each part spans a distinct x band
    for k in range(4):
        xs = pm.c[p_simple == k, 0]
        assert xs.max() - xs.min() < 0.26
    p_h = partition.decompose(pm, 4, method="hierarchical",
                              coeffs={"n": (2, 2, 1), "order": "xyz"})
    assert np.bincount(p_h).tolist() == [16, 16, 16, 16]


def test_manual_decompose(tmp_path):
    from foamtpu.parallel import partition

    pm = _pm()
    want = np.arange(pm.n_cells) % 3
    df = os.path.join(str(tmp_path), "cellToProc")
    with open(df, "w") as f:
        f.write(f"{pm.n_cells}\n(\n"
                + "\n".join(str(int(x)) for x in want) + "\n)\n")
    got = partition.decompose(pm, 3, method="manual",
                              coeffs={"dataFile": df})
    assert (got == want).all()


def _run_tiny_cavity(tmp_path):
    """Tiny icoFoam cavity producing one written time."""
    import shutil

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tutorials", "incompressible",
        "icoFoam", "cavity")
    case = os.path.join(str(tmp_path), "cavity")
    shutil.copytree(src, case)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["run", "-case", case, "-steps", "2"]) == 0
    return case


def test_sample_and_ensight(tmp_path):
    case = _run_tiny_cavity(tmp_path)
    hdr = ("FoamFile { version 2.0; format ascii; class dictionary; "
           "object sampleDict; }\n")
    with open(os.path.join(case, "system", "sampleDict"), "w") as f:
        f.write(hdr + """
fields (U p);
sets
(
    centreline { type uniform; axis distance;
                 start (0.005 0.05 0.005); end (0.095 0.05 0.005);
                 nPoints 20; }
);
""")
    from foamtpu.apps.cli import main

    assert main(["sample", "-case", case]) == 0
    # a sampled .xy exists under postProcessing
    found = []
    for root, _dirs, files in os.walk(case):
        found += [f for f in files if f.endswith(".xy")
                  and "centreline" in f]
    assert found, "no sampled set written"

    assert main(["foamToEnsight", "-case", case]) == 0
    ens = os.path.join(case, "EnSight")
    assert os.path.exists(os.path.join(ens, "case.case"))
    assert os.path.exists(os.path.join(ens, "geometry"))
    txt = open(os.path.join(ens, "case.case")).read()
    assert "ensight gold" in txt and "p" in txt


def test_surface_utilities(tmp_path, capsys):
    """surfaceCheck/surfaceConvert/surfaceTransformPoints round-trip
    on a closed box STL."""
    import numpy as np

    from foamtpu.mesh.snappy import read_stl, write_stl

    # closed unit cube: 12 triangles
    v = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                  for x in (0, 1)], float)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    tris = []
    for a, b, c, d in quads:
        tris.append([v[a], v[b], v[c]])
        tris.append([v[a], v[c], v[d]])
    tris = np.asarray(tris)
    stl = os.path.join(str(tmp_path), "box.stl")
    write_stl(stl, tris)
    from foamtpu.apps.cli import main

    assert main(["surfaceCheck", stl]) == 0
    out = capsys.readouterr().out
    assert "closed" in out and "Degenerate tris: 0" in out

    obj = os.path.join(str(tmp_path), "box.obj")
    assert main(["surfaceConvert", stl, obj]) == 0
    stl2 = os.path.join(str(tmp_path), "box2.stl")
    assert main(["surfaceConvert", obj, stl2]) == 0
    t2 = read_stl(stl2)
    assert t2.shape == (12, 3, 3)
    assert abs(t2.reshape(-1, 3).max() - 1.0) < 1e-6

    moved = os.path.join(str(tmp_path), "moved.stl")
    assert main(["surfaceTransformPoints", stl, moved,
                 "-translate", "(1 2 3)", "-scale", "(2 2 2)"]) == 0
    t3 = read_stl(moved)
    assert abs(t3.reshape(-1, 3).min(axis=0) - [1, 2, 3]).max() < 1e-5
    assert abs(t3.reshape(-1, 3).max(axis=0) - [3, 4, 5]).max() < 1e-5


def _fluent_box_msh(path, nx=2, ny=2, nz=1):
    """Write a tiny ASCII Fluent hex-box mesh by converting a blockMesh
    PolyMesh into the Fluent section format (faces carry owner/nbr)."""
    pm = _pm()  # 4x4x4 cube
    with open(path, "w") as f:
        f.write('(0 "fluent box")\n')
        f.write("(2 3)\n")
        np_, nc, nf = pm.n_points, pm.n_cells, pm.n_faces
        nif = pm.n_internal_faces
        f.write(f"(10 (0 1 {np_:x} 0))\n")
        f.write(f"(10 (1 1 {np_:x} 1 3)(\n")
        for p in pm.points:
            f.write(f"{p[0]:.10g} {p[1]:.10g} {p[2]:.10g}\n")
        f.write("))\n")
        f.write(f"(12 (0 1 {nc:x} 0))\n")
        f.write(f"(12 (2 1 {nc:x} 1 4))\n")
        # interior faces zone 3
        f.write(f"(13 (0 1 {nf:x} 0))\n")
        f.write(f"(13 (3 1 {nif:x} 2 0)(\n")
        for fc in range(nif):
            pts = pm.face_pts[fc, :pm.face_npts[fc]]
            f.write(f"{len(pts):x} "
                    + " ".join(f"{p + 1:x}" for p in pts)
                    + f" {pm.owner[fc] + 1:x} {pm.neighbour[fc] + 1:x}\n")
        f.write("))\n")
        zid = 4
        start = nif + 1
        for p in pm.patches:
            f.write(f"(13 ({zid:x} {start:x} {start + p.size - 1:x} "
                    f"3 0)(\n")
            for fc in range(p.start, p.start + p.size):
                pts = pm.face_pts[fc, :pm.face_npts[fc]]
                f.write(f"{len(pts):x} "
                        + " ".join(f"{q + 1:x}" for q in pts)
                        + f" {pm.owner[fc] + 1:x} 0\n")
            f.write("))\n")
            f.write(f"(39 ({zid} wall {p.name})())\n")
            start += p.size
            zid += 1
    return pm


def test_fluent_mesh_to_foam(tmp_path):
    """fluentMeshToFoam converts an ASCII Fluent mesh; the result has
    identical volume/closure to the source mesh and icoFoam-style FV
    assembly works on it (checkMesh passes)."""
    msh = os.path.join(str(tmp_path), "box.msh")
    src = _fluent_box_msh(msh)
    case = os.path.join(str(tmp_path), "c")
    os.makedirs(case, exist_ok=True)
    from foamtpu.apps.cli import main

    assert main(["fluentMeshToFoam", msh, "-case", case]) == 0
    from foamtpu.io import polymesh as mesh_io

    pm = mesh_io.read(os.path.join(case, "constant", "polyMesh"))
    _check(pm)
    assert pm.n_cells == src.n_cells
    assert abs(pm.v.sum() - src.v.sum()) < 1e-10
    names = {p.name for p in pm.patches}
    assert {"right", "left", "rest"} <= names
    assert main(["checkMesh", "-case", case]) == 0
