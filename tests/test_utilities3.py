"""Utility batch 3 (apps/meshutils3.py; reference: applications/
utilities/mesh/manipulation/{createBaffles,setsToZones,deformedGeom},
miscellaneous/foamFormatConvert, postProcessing/channel/)."""

import os
import shutil

import numpy as np
import pytest

from foamtpu.apps import meshutils3
from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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


def _closed(pm):
    acc = np.zeros((pm.n_cells, 3))
    nif = pm.n_internal_faces
    np.add.at(acc, pm.owner[:nif], pm.sf[:nif])
    np.subtract.at(acc, pm.neighbour, pm.sf[:nif])
    np.add.at(acc, pm.owner[nif:], pm.sf[nif:])
    assert np.abs(acc).max() < 1e-10 * pm.mag_sf.max()


def test_create_baffles_blocks_diffusion():
    """Baffling the x=0.5 plane: mesh stays closed, internal face
    count drops, and heat can no longer diffuse across the plane."""
    import jax.numpy as jnp

    from foamtpu.core.dimensions import dimViscosity
    from foamtpu.core.fields import vol_scalar
    from foamtpu.mesh import to_device
    from foamtpu.ops import fvm
    from foamtpu.solvers import linear

    pm = blockmesh.generate(parse_string(BOX))
    nif0 = pm.n_internal_faces
    plane = np.nonzero(
        (np.abs(pm.cf[:nif0, 0] - 0.5) < 1e-9))[0]
    assert plane.size == 16
    out = meshutils3.create_baffles(pm, plane, "baffle")
    assert out.n_internal_faces == nif0 - plane.size
    assert out.patches[-1].name == "baffle_slave"
    assert out.patches[-2].name == "baffle_master"
    assert out.patches[-1].size == plane.size
    _closed(out)

    def diffuse(p_mesh, nsteps=20):
        mesh = to_device(p_mesh)
        T = vol_scalar(mesh, 0.0, name="T").with_data(
            jnp.where(jnp.asarray(p_mesh.c[:, 0]) < 0.5, 1.0, 0.0))
        dt = 5e-3
        ctl = {"solver": "PCG", "preconditioner": "polynomial",
               "tolerance": 1e-9, "relTol": 0.0, "maxIter": 500}
        for _ in range(nsteps):
            eqn = (fvm.ddt(mesh, T, T.data, 1.0 / dt)
                   - fvm.laplacian(mesh, 1e-0, T,
                                   gamma_dims=dimViscosity))
            data, _ = linear.solve(mesh, eqn, T.data, ctl)
            T = T.with_data(data)
        d = np.asarray(T.data)
        left = d[p_mesh.c[:, 0] < 0.5].mean()
        right = d[p_mesh.c[:, 0] > 0.5].mean()
        return left, right

    l0, r0 = diffuse(pm)
    l1, r1 = diffuse(out)
    # unbaffled: strong mixing; baffled: the jump survives
    assert r0 > 0.2
    assert r1 < 1e-6
    assert l1 > 1.0 - 1e-6


def test_create_baffles_cli(tmp_path):
    """topoSet(boxToFace) -> createBaffles through the CLI."""
    case = str(tmp_path / "c")
    os.makedirs(os.path.join(case, "system"))
    os.makedirs(os.path.join(case, "constant"))
    hdr = ("FoamFile { version 2.0; format ascii; class dictionary; "
           "object %s; }\n")
    with open(os.path.join(case, "system", "blockMeshDict"), "w") as f:
        f.write(hdr % "blockMeshDict" + BOX)
    with open(os.path.join(case, "system", "topoSetDict"), "w") as f:
        f.write(hdr % "topoSetDict" + """
actions
(
    { name baffleFaces; type faceSet; action new; source boxToFace;
      sourceInfo { box (0.49 -1 -1) (0.51 2 2); } }
);
""")
    with open(os.path.join(case, "system", "createBafflesDict"),
              "w") as f:
        f.write(hdr % "createBafflesDict" + """
internalFacesOnly true;
baffles
{
    b1 { type faceSet; set baffleFaces; patchName baffle;
         patchType wall; }
}
""")
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["topoSet", "-case", case]) == 0
    assert main(["createBaffles", "-case", case]) == 0
    from foamtpu.io import polymesh as mesh_io

    pm = mesh_io.read(os.path.join(case, "constant", "polyMesh"))
    assert any(p.name == "baffle_master" for p in pm.patches)
    _closed(pm)


def test_sets_to_zones(tmp_path):
    case = str(tmp_path / "c")
    os.makedirs(os.path.join(case, "system"))
    os.makedirs(os.path.join(case, "constant"))
    hdr = ("FoamFile { version 2.0; format ascii; class dictionary; "
           "object %s; }\n")
    with open(os.path.join(case, "system", "blockMeshDict"), "w") as f:
        f.write(hdr % "blockMeshDict" + BOX)
    with open(os.path.join(case, "system", "topoSetDict"), "w") as f:
        f.write(hdr % "topoSetDict" + """
actions
(
    { name leftCells; type cellSet; action new; source boxToCell;
      sourceInfo { box (-1 -1 -1) (0.5 2 2); } }
);
""")
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["topoSet", "-case", case]) == 0
    assert main(["setsToZones", "-case", case]) == 0
    from foamtpu.io import polymesh as mesh_io

    pm = mesh_io.read(os.path.join(case, "constant", "polyMesh"))
    assert "leftCells" in pm.cell_zones
    assert pm.cell_zones["leftCells"].size == 48   # half of 6*4*4


@pytest.fixture(scope="module")
def cavity_done(tmp_path_factory):
    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    dst = str(tmp_path_factory.mktemp("u3") / "cavity")
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", dst]) == 0
    run_case(dst, max_steps=3)
    return dst


def test_foam_format_convert_roundtrip(cavity_done):
    from foamtpu.apps.cli import main
    from foamtpu.core.case import Case

    c = Case(cavity_done)
    t = c.latest_time_name()
    U0 = np.asarray(c.read_field("U", time=t).data).copy()
    assert main(["foamFormatConvert", "-format", "binary",
                 "-case", cavity_done]) == 0
    raw = open(os.path.join(cavity_done, t, "U"), "rb").read()
    assert b"format      binary" in raw or b"format binary" in raw \
        or b"binary" in raw[:400]
    U1 = np.asarray(Case(cavity_done).read_field("U", time=t).data)
    np.testing.assert_allclose(U1, U0, rtol=0, atol=0)
    assert main(["foamFormatConvert", "-format", "ascii",
                 "-case", cavity_done]) == 0
    U2 = np.asarray(Case(cavity_done).read_field("U", time=t).data)
    np.testing.assert_allclose(U2, U0, rtol=1e-6)


def test_post_channel(cavity_done):
    from foamtpu.apps.cli import main

    assert main(["postChannel", "-case", cavity_done]) == 0
    from foamtpu.core.case import Case

    t = Case(cavity_done).latest_time_name()
    path = os.path.join(cavity_done, "postProcessing", "channel", t,
                        "Uf.xy")
    arr = np.loadtxt(path)
    assert arr.shape[1] == 7
    assert arr.shape[0] == 20          # 20 y-rows in the 20x20 cavity
    # the lid row has the largest mean Ux
    assert arr[-1, 1] == arr[:, 1].max()


def test_deformed_geom(cavity_done):
    from foamtpu.apps.cli import main
    from foamtpu.io import polymesh as mesh_io

    mdir = os.path.join(cavity_done, "constant", "polyMesh")
    pts0 = mesh_io.read(mdir).points.copy()
    assert main(["deformedGeom", "0.001", "-case", cavity_done]) == 0
    pm = mesh_io.read(mdir)
    assert pm.points.shape == pts0.shape
    d = np.linalg.norm(pm.points - pts0, axis=1)
    assert d.max() > 0.0
    assert d.max() < 0.01      # small, bounded deformation
    assert pm.v.min() > 0      # still a valid mesh


def test_obj_to_vtk(tmp_path):
    obj = str(tmp_path / "t.obj")
    vtk = str(tmp_path / "t.vtk")
    with open(obj, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    from foamtpu.apps.cli import main

    assert main(["objToVTK", obj, vtk]) == 0
    txt = open(vtk).read()
    assert "POLYGONS 1" in txt


def test_particle_tracks(tmp_path):
    """particleTracks joins parcel positions across write times into
    VTK polylines, correlated by origId."""
    import shutil as _sh

    src = os.path.join(REPO, "tutorials", "lagrangian",
                       "icoUncoupledKinematicParcelFoam",
                       "fallingCloud")
    dst = str(tmp_path / "fc")
    _sh.copytree(src, dst)
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", dst]) == 0
    run_case(dst)
    assert main(["particleTracks", "-case", dst]) == 0
    vtk = os.path.join(dst, "postProcessing", "particleTracks",
                       "tracks.vtk")
    txt = open(vtk).read()
    assert "LINES 16" in txt
    # every track has >= 2 points and tracks fall (y decreases)
    pts = np.array([[float(v) for v in ln.split()]
                    for ln in txt.split("POINTS")[1].splitlines()[1:33]])
    first = pts[0]
    second = pts[1]
    assert second[1] < first[1]   # gravity pulls the track down


def test_stitch_mesh_inverts_baffles():
    """stitchMesh merges two coincident patches back into internal
    faces: baffling then stitching restores the internal face count
    and diffusion flows across the plane again."""
    from foamtpu.apps.meshutils3 import create_baffles, stitch_mesh

    pm = blockmesh.generate(parse_string(BOX))
    nif0 = pm.n_internal_faces
    plane = np.nonzero(np.abs(pm.cf[:nif0, 0] - 0.5) < 1e-9)[0]
    baffled = create_baffles(pm, plane, "baffle")
    assert baffled.n_internal_faces == nif0 - plane.size
    stitched = stitch_mesh(baffled, "baffle_master", "baffle_slave")
    assert stitched.n_internal_faces == nif0
    assert not any(p.name.startswith("baffle")
                   for p in stitched.patches)
    _closed(stitched)
    # volumes identical to the original mesh
    np.testing.assert_allclose(np.sort(stitched.v), np.sort(pm.v),
                               rtol=1e-12)


def test_temporal_interpolate(cavity_done):
    from foamtpu.apps.cli import main
    from foamtpu.core.case import Case

    c = Case(cavity_done)
    # two consecutive saved times from the earlier run
    times = sorted(float(d) for d in os.listdir(cavity_done)
                   if d.replace(".", "").isdigit()
                   and os.path.isdir(os.path.join(cavity_done, d)))
    t0, t1 = times[-2], times[-1]
    mid = 0.5 * (t0 + t1)
    assert main(["temporalInterpolate", "-time", str(mid),
                 "-fields", "(U p)", "-case", cavity_done]) == 0
    from foamtpu.core import runtime as rt

    tname = rt.time_name(mid, c.time.time_precision)
    Um = np.asarray(Case(cavity_done).read_field("U",
                                                 time=tname).data)
    U0 = np.asarray(c.read_field("U", time=rt.time_name(
        t0, c.time.time_precision)).data)
    U1 = np.asarray(c.read_field("U", time=rt.time_name(
        t1, c.time.time_precision)).data)
    np.testing.assert_allclose(Um, 0.5 * (U0 + U1), rtol=1e-5,
                               atol=1e-8)


def test_write_cell_volumes_and_surface_subset(cavity_done, tmp_path):
    from foamtpu.apps.cli import main
    from foamtpu.core.case import Case

    assert main(["writeCellVolumes", "-case", cavity_done]) == 0
    c = Case(cavity_done)
    t = c.latest_time_name()
    V = np.asarray(c.read_field("V", time=t).data)
    # the shared fixture was deformedGeom'ed by an earlier test: a
    # ~3e-5 relative volume change is expected
    np.testing.assert_allclose(V.sum(), 0.1 * 0.1 * 0.01, rtol=1e-3)

    # surfaceSubset on a 2-triangle square: keep one half
    stl = str(tmp_path / "sq.stl")
    out = str(tmp_path / "half.stl")
    from foamtpu.mesh.snappy import write_stl

    tris = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                       [[1, 0, 0], [1, 1, 0], [0, 1, 0]]], float)
    write_stl(stl, tris)
    assert main(["surfaceSubset", stl, out,
                 "-box", "0 0 -1 0.5 0.5 1"]) == 0
    from foamtpu.mesh.snappy import read_stl

    assert read_stl(out).shape[0] == 1


def test_set_set_batch(tmp_path):
    """setSet batch scripting (reference: .../mesh/manipulation/
    setSet/): new/add/subtract/invert command sequences."""
    case = str(tmp_path / "c")
    os.makedirs(os.path.join(case, "system"))
    os.makedirs(os.path.join(case, "constant"))
    hdr = ("FoamFile { version 2.0; format ascii; class dictionary; "
           "object blockMeshDict; }\n")
    with open(os.path.join(case, "system", "blockMeshDict"), "w") as f:
        f.write(hdr + BOX)
    batch = str(tmp_path / "batch.setSet")
    with open(batch, "w") as f:
        f.write("""
cellSet left new boxToCell (-1 -1 -1) (0.5 2 2)
cellSet left add boxToCell (-1 -1 -1) (0.7 2 2)
cellSet left subtract boxToCell (-1 -1 -1) (0.2 2 2)
cellSet right new boxToCell (-1 -1 -1) (2 2 2)
cellSet right invert
quit
""")
    from foamtpu.apps.cli import main
    from foamtpu.apps.meshutils import read_set

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["setSet", "-case", case, "-batch", batch]) == 0
    left = read_set(case, "left")
    # 6x4x4 box: x-columns at 1/6..6/6; add->0.7 covers 4 cols (64),
    # subtract->0.2 removes col 1 (16) => 48
    assert left.size == 48
    right = read_set(case, "right")
    assert right.size == 0          # inverted full set


def test_netgen_neutral_to_foam(tmp_path):
    """netgenNeutralToFoam: a 6-tet Kuhn cube converts to a closed
    polyMesh with unit volume and 12 boundary triangles."""
    neu = str(tmp_path / "cube.neu")
    # unit cube, 8 points, Kuhn triangulation into 6 tets around the
    # main diagonal 1-7 (1-indexed)
    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
           (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    tets = [(1, 2, 3, 7), (1, 3, 4, 7), (1, 4, 8, 7),
            (1, 8, 5, 7), (1, 5, 6, 7), (1, 6, 2, 7)]
    # boundary triangles: each cube face split along its diagonal that
    # touches 1 or 7 (consistent with the Kuhn tets)
    faces = [(1, 2, 3), (1, 3, 4),            # z=0
             (5, 6, 7), (5, 7, 8),            # z=1
             (1, 2, 6), (1, 6, 5),            # y=0
             (3, 4, 8), (3, 8, 7),            # y=1
             (1, 4, 8), (1, 8, 5),            # x=0
             (2, 3, 7), (2, 7, 6)]            # x=1
    with open(neu, "w") as f:
        f.write(f"{len(pts)}\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
        f.write(f"{len(tets)}\n")
        for t in tets:
            f.write("1 " + " ".join(map(str, t)) + "\n")
        f.write(f"{len(faces)}\n")
        for i, t in enumerate(faces):
            f.write(f"{1 + i // 2} " + " ".join(map(str, t)) + "\n")
    case = str(tmp_path / "c")
    os.makedirs(os.path.join(case, "constant"), exist_ok=True)
    from foamtpu.apps.cli import main

    assert main(["netgenNeutralToFoam", neu, "-case", case]) == 0
    from foamtpu.io import polymesh as mesh_io

    pm = mesh_io.read(os.path.join(case, "constant", "polyMesh"))
    assert pm.n_cells == 6
    assert pm.n_faces - pm.n_internal_faces == 12
    np.testing.assert_allclose(pm.v.sum(), 1.0, rtol=1e-12)
    _closed(pm)
    assert len(pm.patches) == 6        # one per bc id


def test_write_mesh_obj_and_debug_switches(tmp_path, capsys):
    case = str(tmp_path / "c")
    os.makedirs(os.path.join(case, "system"))
    os.makedirs(os.path.join(case, "constant"))
    hdr = ("FoamFile { version 2.0; format ascii; class dictionary; "
           "object blockMeshDict; }\n")
    with open(os.path.join(case, "system", "blockMeshDict"), "w") as f:
        f.write(hdr + BOX)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["writeMeshObj", "-case", case]) == 0
    obj = os.path.join(case, "meshBoundary.obj")
    lines = open(obj).read().splitlines()
    nv = sum(1 for l in lines if l.startswith("v "))
    nf = sum(1 for l in lines if l.startswith("f "))
    assert nv == 7 * 5 * 5             # (6+1)(4+1)(4+1) points
    assert nf == 2 * (6 * 4 + 6 * 4 + 4 * 4)
    capsys.readouterr()
    assert main(["foamDebugSwitches"]) == 0
    out = capsys.readouterr().out
    assert "lduMatrix" in out
