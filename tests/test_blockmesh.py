import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh
from foamtpu.mesh.check import check


CAVITY = """
convertToMeters 0.1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (20 20 1) simpleGrading (1 1 1) );
edges ();
boundary
(
    movingWall { type wall; faces ((3 7 6 2)); }
    fixedWalls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
mergePatchPairs ();
"""


def cavity_mesh(n=20):
    d = parse_string(CAVITY.replace("(20 20 1)", f"({n} {n} 1)"))
    return blockmesh.generate(d)


def test_cavity_counts():
    m = cavity_mesh()
    assert m.n_cells == 400
    assert m.n_points == 21 * 21 * 2
    assert m.n_internal_faces == 2 * 19 * 20
    assert m.n_faces == m.n_internal_faces + 20 + 60 + 800
    names = {p.name: p for p in m.patches}
    assert names["movingWall"].size == 20
    assert names["fixedWalls"].size == 60
    assert names["frontAndBack"].size == 800


def test_cavity_geometry():
    m = cavity_mesh()
    stats = check(m)
    np.testing.assert_allclose(stats["totalVolume"], 0.1 * 0.1 * 0.01, rtol=1e-12)
    np.testing.assert_allclose(m.v, 0.005 * 0.005 * 0.01, rtol=1e-12)
    assert stats["maxNonOrtho"] < 1e-6
    # interpolation weights are 0.5 on a uniform mesh
    np.testing.assert_allclose(m.weights[: m.n_internal_faces], 0.5, atol=1e-12)
    # deltaCoeffs = 1/0.005 on internal faces
    np.testing.assert_allclose(
        m.delta_coeffs[: m.n_internal_faces], 200.0, rtol=1e-12
    )


def test_grading():
    d = parse_string(
        """
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (10 1 1) simpleGrading (4 1 1) );
boundary ( walls { type wall; faces (
    (0 3 2 1) (4 5 6 7) (0 1 5 4) (3 7 6 2) (0 4 7 3) (1 2 6 5) ); } );
"""
    )
    m = blockmesh.generate(d)
    assert m.n_cells == 10
    check(m)
    # expansion ratio: last/first cell size = 4
    xs = np.sort(np.unique(np.round(m.points[:, 0], 12)))
    sizes = np.diff(xs)
    np.testing.assert_allclose(sizes[-1] / sizes[0], 4.0, rtol=1e-9)
    np.testing.assert_allclose(sizes[1:] / sizes[:-1], sizes[1] / sizes[0], rtol=1e-9)


def test_multiblock_merge():
    # two blocks sharing a face -> merged points, internal interface faces
    d = parse_string(
        """
vertices (
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
    (2 0 0) (2 1 0) (2 0 1) (2 1 1)
);
blocks (
    hex (0 1 2 3 4 5 6 7) (4 4 4) simpleGrading (1 1 1)
    hex (1 8 9 2 5 10 11 6) (4 4 4) simpleGrading (1 1 1)
);
boundary ( );
"""
    )
    m = blockmesh.generate(d)
    assert m.n_cells == 128
    # shared face plane merged: 5x5 points shared once
    assert m.n_points == 5 * 5 * 5 * 2 - 5 * 5
    # interface faces became internal
    assert m.n_internal_faces == 2 * (3 * 4 * 4 * 3) + 4 * 4
    stats = check(m)
    np.testing.assert_allclose(stats["totalVolume"], 2.0, rtol=1e-12)
    # unassigned boundary -> defaultFaces
    assert m.patches[-1].name == "defaultFaces"


def test_cell_tables():
    m = cavity_mesh(4)
    t = m.cell_tables()
    assert t["max_faces"] == 6
    # every cell has exactly 6 entries (hexes)
    assert (np.abs(t["csign"]).sum(axis=1) == 6).all()
    # internal + boundary partition
    np.testing.assert_allclose(
        t["cnbr_valid"].sum(), 2 * m.n_internal_faces
    )
    np.testing.assert_allclose(t["cbnd"].sum(), m.n_boundary_faces)
    # divergence of a constant flux field is zero: sum csign * phi_f == 0
    # for phi = Sf . const_vector
    u = np.array([1.0, 2.0, 3.0])
    phi = m.sf @ u
    div = (phi[t["cface"]] * t["csign"]).sum(axis=1)
    np.testing.assert_allclose(div, 0.0, atol=1e-12)


def test_arc_edges():
    # quarter-annulus block with arc edges
    r1, r2 = 1.0, 2.0
    d = parse_string(
        f"""
vertices (
    ({r1} 0 0) ({r2} 0 0) (0 {r2} 0) (0 {r1} 0)
    ({r1} 0 0.1) ({r2} 0 0.1) (0 {r2} 0.1) (0 {r1} 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (8 16 1) simpleGrading (1 1 1) );
edges (
    arc 0 3 (0.70710678 0.70710678 0)
    arc 1 2 (1.41421356 1.41421356 0)
    arc 4 7 (0.70710678 0.70710678 0.1)
    arc 5 6 (1.41421356 1.41421356 0.1)
);
boundary ( );
"""
    )
    m = blockmesh.generate(d)
    stats = check(m)
    exact = 0.25 * np.pi * (r2**2 - r1**2) * 0.1
    np.testing.assert_allclose(stats["totalVolume"], exact, rtol=2e-3)
    # all points lie between the radii
    r = np.linalg.norm(m.points[:, :2], axis=1)
    assert (r > r1 - 1e-6).all() and (r < r2 + 1e-6).all()


def test_merge_patch_pairs():
    """mergePatchPairs joins the conformal interface between two blocks
    declared with separate vertices (reference: blockMesh
    mergePatchPairs): the pair patches empty out, the faces become
    internal, and a scalar diffusion problem sees one connected
    domain."""
    import numpy as np

    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh

    TWO = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
    (1 0 0) (2 0 0) (2 1 0) (1 1 0)
    (1 0 1) (2 0 1) (2 1 1) (1 1 1)
);
blocks
(
    hex (0 1 2 3 4 5 6 7) (4 4 4) simpleGrading (1 1 1)
    hex (8 9 10 11 12 13 14 15) (4 4 4) simpleGrading (1 1 1)
);
boundary
(
    leftOut  { type patch; faces ((1 2 6 5)); }
    rightIn  { type patch; faces ((8 12 15 11)); }
    walls { type wall; faces ((0 4 7 3) (9 10 14 13)
        (0 1 5 4) (3 7 6 2) (0 3 2 1) (4 5 6 7)
        (8 9 13 12) (11 15 14 10) (8 11 10 9) (12 13 14 15)); }
);
mergePatchPairs ( (leftOut rightIn) );
"""
    pm = blockmesh.generate(parse_string(TWO))
    # NOTE: coincident vertices already merge points, so the two
    # declared interface patches hold coincident faces; the pair merge
    # must empty them into internal faces
    lo = pm.patch("leftOut")
    ri = pm.patch("rightIn")
    assert lo.size == 0 and ri.size == 0
    assert pm.n_cells == 128
    assert pm.n_internal_faces >= 4 * 4 * 4 * 3 - 48 + 16
    # closed cells
    acc = np.zeros((pm.n_cells, 3))
    nif = pm.n_internal_faces
    np.add.at(acc, pm.owner[:nif], pm.sf[:nif])
    np.subtract.at(acc, pm.neighbour, pm.sf[:nif])
    np.add.at(acc, pm.owner[nif:], pm.sf[nif:])
    assert np.abs(acc).max() < 1e-10
