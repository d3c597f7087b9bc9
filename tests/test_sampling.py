"""Sampling/post function objects (reference: src/sampling/,
src/postProcessing/functionObjects/{utilities,field}/)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import make_cavity
from foamtpu.core.dictionary import parse_string
from foamtpu.solvers import piso


class _FakeCase:
    def __init__(self, mesh, tmpdir):
        self.mesh = mesh
        self.dir = str(tmpdir)

    def transport_properties(self):
        from foamtpu.core.dictionary import parse_string

        return parse_string("nu nu [0 2 -1 0 0 0 0] 0.01;")


def _run_cavity(n=16, steps=5):
    mesh, state, cfg = make_cavity(n)
    step = jax.jit(lambda s, d: piso.piso_step(mesh, s, d, cfg))
    dt = jnp.asarray(0.005, mesh.v.dtype)
    for _ in range(steps):
        state, _ = step(state, dt)
    return mesh, state


def test_yplus_and_wall_shear(tmp_path):
    from foamtpu.functionobjects.sampling import WallShearStress, YPlus

    mesh, state = _run_cavity()
    case = _FakeCase(mesh, tmp_path)
    spec = parse_string("type yPlus;")
    yp = YPlus("yp", spec, case)
    yp.execute("0.025", state)
    lines = open(yp.path).read().strip().splitlines()
    # header + one line per wall patch (movingWall + fixedWalls)
    assert len(lines) == 3
    vals = [float(x) for x in lines[1].split()[2:]]
    assert all(np.isfinite(vals)) and vals[1] >= vals[0] >= 0.0

    ws = WallShearStress("ws", parse_string("type wallShearStress;"), case)
    ws.execute("0.025", state)
    wl = open(ws.path).read().strip().splitlines()
    assert len(wl) == 3
    # the moving lid drives a real shear
    mx = max(float(l.split()[3]) for l in wl[1:])
    assert mx > 1e-6


def test_sampled_line_set(tmp_path):
    from foamtpu.functionobjects.sampling import SampledSets

    mesh, state = _run_cavity()
    case = _FakeCase(mesh, tmp_path)
    spec = parse_string("""
type sets;
fields (U p);
sets
{
    centreline { type uniform; start (0.05 0.0 0.005);
                 end (0.05 0.1 0.005); nPoints 20; }
}
""")
    so = SampledSets("lines", spec, case)
    so.execute("0.025", state)
    out = os.path.join(case.dir, "postProcessing", "lines", "0.025",
                       "centreline_U_p.xy")
    arr = np.loadtxt(out)
    assert arr.shape == (20, 5)  # dist + U(3) + p
    # the vertical centreline through the cavity: Ux near the lid (last
    # point) is larger than at the bottom
    assert arr[-1, 1] > arr[0, 1]


def test_streamlines(tmp_path):
    from foamtpu.functionobjects.sampling import StreamLine

    mesh, state = _run_cavity(steps=10)
    case = _FakeCase(mesh, tmp_path)
    spec = parse_string("""
type streamLine;
lifeTime 50;
seedSampleSet { type uniform; start (0.02 0.09 0.005);
                end (0.08 0.09 0.005); nPoints 3; }
""")
    so = StreamLine("sl", spec, case)
    so.execute("0.025", state)
    arr = np.loadtxt(os.path.join(case.dir, "postProcessing", "sl",
                                  "0.025", "tracks.xy"))
    assert arr.shape[1] == 4
    # tracks actually moved: multiple points per seed, finite coords
    assert arr.shape[0] > 6
    assert np.isfinite(arr).all()
    # near-lid seeds get advected in +x by the moving wall
    t0 = arr[arr[:, 0] == 0]
    assert t0[-1, 1] > t0[0, 1]


def test_sampled_surfaces_cutting_plane_and_iso(tmp_path):
    """sampledSurfaces: a cutting plane through the cavity and an
    isoSurface of a radial scalar come out as closed triangulations
    with correctly interpolated vertex values (reference:
    src/sampling/sampledSurface/{cuttingPlane,isoSurface})."""
    import os
    import shutil

    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    dst = os.path.join(tmp_path, "cavity")
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", dst]) == 0
    from foamtpu.core.case import Case
    from foamtpu.core.dictionary import parse_string
    from foamtpu.functionobjects.surfaces import SampledSurfaces

    case = Case(dst)
    pm = case.poly_mesh
    spec = parse_string("""
type surfaces;
fields (T U);
surfaces
(
    midPlane
    {
        type cuttingPlane;
        pointAndNormalDict
        { basePoint (0.05 0.05 0.005); normalVector (1 0 0); }
    }
    ring
    {
        type isoSurface;
        isoField T;
        isoValue 0.03;
    }
);
""")
    fo = SampledSurfaces("sampled", spec, case)
    c = np.asarray(pm.c)
    # T = distance from the cavity axis (x=0.05, y=0.05)
    T = np.linalg.norm(c[:, :2] - 0.05, axis=1)
    state = {"T": jnp.asarray(T),
             "U": type("F", (), {"data": jnp.asarray(c)})()}
    fo.execute("0.1", state)
    base = os.path.join(dst, "postProcessing", "sampled", "0.1")
    for fn in ("midPlane.vtk", "ring.vtk"):
        assert os.path.exists(os.path.join(base, fn))
    # parse the plane back: all verts at x ~ 0.05, T values match r
    txt = open(os.path.join(base, "midPlane.vtk")).read().split("\n")
    npts = int(txt[4].split()[1])
    verts = np.array([[float(x) for x in txt[5 + i].split()]
                      for i in range(npts)])
    assert npts > 0
    assert np.allclose(verts[:, 0], 0.05, atol=1e-8)
    # plane spans the cavity
    assert verts[:, 1].min() < 0.01 and verts[:, 1].max() > 0.09
    # isoSurface: vertices lie near r = 0.03 (linear interp on a
    # coarse 20x20 mesh: few-mm tolerance)
    txt = open(os.path.join(base, "ring.vtk")).read().split("\n")
    npts = int(txt[4].split()[1])
    verts = np.array([[float(x) for x in txt[5 + i].split()]
                      for i in range(npts)])
    r = np.linalg.norm(verts[:, :2] - 0.05, axis=1)
    assert np.abs(r - 0.03).max() < 0.01
    assert np.abs(r - 0.03).mean() < 0.003


def test_sampled_patch_surface(tmp_path):
    """sampledSurfaces type patch: fan-triangulated patch faces with
    owner-cell values (reference: src/sampling/sampledSurface/
    sampledPatch/)."""
    import os
    import shutil

    import numpy as np

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(REPO, "tutorials", "incompressible", "icoFoam",
                       "cavity")
    dst = str(tmp_path / "cavity")
    shutil.copytree(src, dst)
    cd = os.path.join(dst, "system", "controlDict")
    with open(cd, "a") as f:
        f.write("""
functions
{
    lid
    {
        type            surfaces;
        surfaceFormat   vtk;
        fields          ( p U );
        surfaces
        (
            movingWallSurf { type patch; patches ( movingWall ); }
        );
    }
}
""")
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", dst]) == 0
    case = run_case(dst, max_steps=3)
    t = case.time.name
    vtk = os.path.join(dst, "postProcessing", "lid", t,
                       "movingWallSurf.vtk")
    assert os.path.exists(vtk), vtk
    txt = open(vtk).read()
    # 20 quad faces -> 40 triangles, 80 points (fan duplicates)
    assert "POLYGONS 40" in txt
    assert "VECTORS U" in txt and "SCALARS p" in txt
