"""snappyHexMesh (castellated) tests (reference:
applications/utilities/mesh/generation/snappyHexMesh/, castellated
stage)."""

import os

import numpy as np

from foamtpu.mesh import snappy


def _cube_tris(lo, hi):
    l, h = np.asarray(lo, float), np.asarray(hi, float)
    corners = np.array([[l[0], l[1], l[2]], [h[0], l[1], l[2]],
                        [h[0], h[1], l[2]], [l[0], h[1], l[2]],
                        [l[0], l[1], h[2]], [h[0], l[1], h[2]],
                        [h[0], h[1], h[2]], [l[0], h[1], h[2]]])
    quads = [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4), (2, 3, 7, 6),
             (1, 2, 6, 5), (3, 0, 4, 7)]
    tris = []
    for a, b, c, d in quads:
        tris.append(corners[[a, b, c]])
        tris.append(corners[[a, c, d]])
    return np.asarray(tris)


def test_stl_roundtrip(tmp_path):
    tris = _cube_tris((0, 0, 0), (1, 2, 3))
    path = str(tmp_path / "cube.stl")
    snappy.write_stl(path, tris)
    back = snappy.read_stl(path)
    assert back.shape == tris.shape
    assert np.allclose(np.sort(back.reshape(-1, 3), axis=0),
                       np.sort(tris.reshape(-1, 3), axis=0))


def test_points_inside_cube():
    tris = _cube_tris((0.25, 0.25, 0.25), (0.75, 0.75, 0.75))
    pts = np.array([[0.5, 0.5, 0.5], [0.1, 0.5, 0.5], [0.26, 0.3, 0.3],
                    [0.9, 0.9, 0.9], [0.5, 0.5, 0.74]])
    ins = snappy.points_inside(tris, pts)
    assert list(ins) == [True, False, True, False, True]


def test_castellate_cube_in_box(tmp_path):
    """16^3 box minus a voxel-aligned cube: exact cell count, body
    patch closed, mesh checks out, and flow past the body runs."""
    from foamtpu.core.dictionary import parse_string
    from foamtpu.io import polymesh as mesh_io
    from foamtpu.mesh import blockmesh, to_device
    from foamtpu.mesh.check import check

    pm = blockmesh.generate(parse_string("""
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (16 16 16) simpleGrading (1 1 1) );
boundary (
  inlet  { type patch; faces ((0 4 7 3)); }
  outlet { type patch; faces ((2 6 5 1)); }
  walls  { type wall; faces ((1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""))
    tris = _cube_tris((0.375, 0.375, 0.375), (0.625, 0.625, 0.625))
    out = snappy.castellate(pm, tris, (0.05, 0.05, 0.05))
    # 4^3 = 64 cells removed exactly (voxel-aligned surface)
    assert out.n_cells == 16 ** 3 - 64
    body = out.patch("body")
    assert body.size == 6 * 16          # 4x4 faces per cube side
    assert abs(out.v.sum() - (1.0 - 0.25 ** 3)) < 1e-10
    check(out, verbose=False)
    # closed body: its face-area vectors sum to ~0
    sf_body = out.sf[body.slice]
    assert np.abs(sf_body.sum(axis=0)).max() < 1e-12

    # write/read and run potentialFoam-like flow past the body
    case = str(tmp_path / "bodyCase")
    os.makedirs(case + "/system", exist_ok=True)
    os.makedirs(case + "/0", exist_ok=True)
    mesh_io.write(out, os.path.join(case, "constant", "polyMesh"))
    hdr = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'
    with open(case + "/system/controlDict", "w") as f:
        f.write(hdr % ("dictionary", "controlDict") + """
application icoFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1; deltaT 0.005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    with open(case + "/system/fvSchemes", "w") as f:
        f.write(hdr % ("dictionary", "fvSchemes") + """
ddtSchemes { default Euler; } gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; } snGradSchemes { default corrected; }
""")
    with open(case + "/system/fvSolution", "w") as f:
        f.write(hdr % ("dictionary", "fvSolution") + """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-6; relTol 0.01; }
    U { solver smoothSolver; smoother GaussSeidel; tolerance 1e-6;
        relTol 0; nSweeps 2; }
}
PISO { nCorrectors 2; }
""")
    with open(case + "/0/U", "w") as f:
        f.write(hdr % ("volVectorField", "U") + """
dimensions [0 1 -1 0 0 0 0];
internalField uniform (1 0 0);
boundaryField
{
    inlet  { type fixedValue; value uniform (1 0 0); }
    outlet { type zeroGradient; }
    walls  { type slip; }
    body   { type slip; }
}
""")
    with open(case + "/0/p", "w") as f:
        f.write(hdr % ("volScalarField", "p") + """
dimensions [0 2 -2 0 0 0 0];
internalField uniform 0;
boundaryField
{
    inlet  { type zeroGradient; }
    outlet { type fixedValue; value uniform 0; }
    walls  { type zeroGradient; }
    body   { type zeroGradient; }
}
""")
    with open(case + "/constant/transportProperties", "w") as f:
        f.write(hdr % ("dictionary", "transportProperties")
                + "transportModel Newtonian;\n"
                + "nu nu [0 2 -1 0 0 0 0] 0.01;\n")
    from foamtpu.core.case import run_case

    c = run_case(case, max_steps=10)
    U = np.asarray(c.final_state["U"].data)
    assert np.isfinite(U).all()
    # flow accelerates around the blockage somewhere
    assert U[:, 0].max() > 1.05


def test_snappy_cli(tmp_path):
    """The snappyHexMesh CLI path: blockMesh + snappyHexMeshDict +
    constant/triSurface STL."""
    case = str(tmp_path / "snap")
    os.makedirs(case + "/constant/triSurface", exist_ok=True)
    os.makedirs(case + "/system", exist_ok=True)
    hdr = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'
    os.makedirs(case + "/constant/polyMesh", exist_ok=True)
    with open(case + "/constant/polyMesh/blockMeshDict", "w") as f:
        f.write(hdr % ("dictionary", "blockMeshDict") + """
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (12 12 12) simpleGrading (1 1 1) );
boundary ( walls { type wall;
  faces ((0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); } );
""")
    snappy.write_stl(case + "/constant/triSurface/obstacle.stl",
                     _cube_tris((0.4, 0.4, 0.4), (0.6, 0.6, 0.6)))
    with open(case + "/system/snappyHexMeshDict", "w") as f:
        f.write(hdr % ("dictionary", "snappyHexMeshDict") + """
castellatedMesh true;
snap false;
addLayers false;
geometry
{
    obstacle.stl { type triSurfaceMesh; name obstacle; }
}
castellatedMeshControls
{
    locationInMesh (0.05 0.05 0.05);
}
""")
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", case]) == 0
    assert main(["snappyHexMesh", "-case", case]) == 0
    from foamtpu.io import polymesh as mesh_io

    out = mesh_io.read(case + "/constant/polyMesh")
    assert out.n_cells < 12 ** 3
    assert any(p.name == "obstacle" for p in out.patches)


def _sphere_tris(center, r, n_theta=12, n_phi=24):
    """UV-sphere triangulation (non-axis-aligned geometry for the
    refine/snap tests)."""
    cx, cy, cz = center
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi + 1)
    tris = []
    for i in range(n_theta):
        for j in range(n_phi):
            p = []
            for (a, b) in ((th[i], ph[j]), (th[i + 1], ph[j]),
                           (th[i + 1], ph[j + 1]), (th[i], ph[j + 1])):
                p.append([cx + r * np.sin(a) * np.cos(b),
                          cy + r * np.sin(a) * np.sin(b),
                          cz + r * np.cos(a)])
            if i > 0:
                tris.append([p[0], p[1], p[2]])
            if i < n_theta - 1:
                tris.append([p[0], p[2], p[3]])
    return np.asarray(tris)


def test_octree_refine_and_snap_sphere():
    """Octree refinement around a sphere + castellate + snap: the
    refined mesh passes checkMesh, has more cells near the body, and
    snapping pulls the staircase body patch onto the sphere (max point
    distance to the surface << the fine cell size, and the carved
    volume approaches the exact sphere volume)."""
    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh
    from foamtpu.mesh.check import check

    pm = blockmesh.generate(parse_string("""
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (8 8 8) simpleGrading (1 1 1) );
boundary (
  inlet  { type patch; faces ((0 4 7 3)); }
  outlet { type patch; faces ((2 6 5 1)); }
  walls  { type wall; faces ((1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""))
    tris = _sphere_tris((0.5, 0.5, 0.5), 0.25)
    box = snappy._background_box(pm)
    assert box is not None
    bb_min, bb_max, base_n, side_patches, two_d = box
    assert base_n == (8, 8, 8) and not two_d
    assert side_patches["x-"][0] == "inlet"
    assert side_patches["x+"][0] == "outlet"

    leaves = snappy.octree_refine(bb_min, bb_max, base_n, tris, 2)
    levels = {c[0] for c in leaves}
    assert levels == {0, 1, 2}
    # 2:1 balance: no leaf has a face-neighbour 2+ levels finer
    ref = snappy.octree_mesh(bb_min, bb_max, base_n, leaves,
                             side_patches)
    assert ref.n_cells == len(leaves)
    check(ref, verbose=False)
    # volume conserved by refinement
    assert abs(ref.v.sum() - 1.0) < 1e-9

    out = snappy.castellate(ref, tris, (0.02, 0.02, 0.02))
    check(out, verbose=False)
    body = out.patch("body")
    assert body.size > 0

    snapped = snappy.snap(out, tris, "body", n_iter=6)
    check(snapped, verbose=False)
    # body points sit on the sphere: |r - 0.25| small vs fine cell 1/32
    b = snapped.patch("body")
    valid = (np.arange(snapped.face_pts.shape[1])[None, :]
             < snapped.face_npts[b.slice][:, None]) \
        & (snapped.face_pts[b.slice] >= 0)
    pids = np.unique(snapped.face_pts[b.slice][valid])
    r = np.linalg.norm(snapped.points[pids] - 0.5, axis=1)
    # quality-guarded (frozen) fringe points may stay at their
    # castellated position, bounded by the fine cell size 1/32;
    # the bulk of the patch sits on the faceted sphere (chord error
    # ~0.009)
    assert np.abs(r - 0.25).max() < 1.0 / 32.0
    assert np.abs(r - 0.25).mean() < 0.006
    # carved volume close to box - sphere (castellated-only is much
    # farther off at this resolution)
    vol_exact = 1.0 - 4.0 / 3.0 * np.pi * 0.25 ** 3
    assert abs(snapped.v.sum() - vol_exact) / vol_exact < 0.02
    # and snapping genuinely moved the boundary (staircase was worse)
    assert np.abs(np.linalg.norm(out.points[pids] - 0.5, axis=1)
                  - 0.25).max() > 0.02
