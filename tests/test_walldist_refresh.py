"""Wall-distance freshness under mesh change (VERDICT r4 weak #5:
host KD-tree y_wall silently stale under motion/AMR/layering).

Oracles: (1) refresh_wall_distance recomputes a model's static y_wall
to match the DEFORMED geometry; (2) mesh.to_device rebuilds the
wall-function adjacency distance (mesh.wall_y) at every re-trace
boundary; (3) rigid (solid-body) motion leaves wall distance invariant
— the documented reason the pimpleDyM path needs no refresh."""

import numpy as np

from foamtpu.core.dictionary import FoamDict, Word, parse_string
from foamtpu.mesh import blockmesh, to_device
from foamtpu.mesh.walldist import refresh_wall_distance, wall_distance
from foamtpu.models.turbulence import select

NU = 1e-4


def _channel_poly(h=0.1):
    d = parse_string(f"""
vertices (
    (0 0 0) (2 0 0) (2 {h} 0) (0 {h} 0)
    (0 0 0.01) (2 0 0.01) (2 {h} 0.01) (0 {h} 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) (30 10 1) simpleGrading (1 1 1) );
boundary (
    inlet {{ type patch; faces ((0 4 7 3)); }}
    outlet {{ type patch; faces ((2 6 5 1)); }}
    walls {{ type wall; faces ((1 5 4 0) (3 7 6 2)); }}
    frontAndBack {{ type empty; faces ((0 3 2 1) (4 5 6 7)); }}
);
""")
    return blockmesh.generate(d)


def _props(m):
    d = FoamDict()
    d[Word("RASModel")] = Word(m)
    d[Word("turbulence")] = Word("on")
    return d


def test_refresh_tracks_deformation():
    poly1 = _channel_poly(h=0.1)
    poly2 = _channel_poly(h=0.05)     # walls moved: channel squeezed 2x
    mesh = to_device(poly1)
    dtype = np.asarray(mesh.v).dtype

    model = select(_props("SpalartAllmaras"), NU)
    model.init_wall_distance(poly1, dtype)
    y1 = np.asarray(model.y_wall)

    n = refresh_wall_distance(model, poly2, dtype)
    assert n == 1
    y2 = np.asarray(model.y_wall)
    assert np.max(np.abs(y2 - y1)) > 1e-3, "y_wall did not change"
    ref = np.maximum(wall_distance(poly2), 1e-10).astype(dtype)
    np.testing.assert_allclose(y2, ref, rtol=1e-6)
    # mid-channel distance halves with the gap
    assert abs(y2.max() - 0.5 * y1.max()) < 0.2 * y1.max()


def test_refresh_noop_without_y_wall():
    poly = _channel_poly()
    model = select(_props("kEpsilon"), NU)   # no init_wall_distance
    assert refresh_wall_distance(model, poly, np.float32) == 0
    assert refresh_wall_distance(None, poly, np.float32) == 0
    sa = select(_props("SpalartAllmaras"), NU)
    assert refresh_wall_distance([model, sa, None], poly,
                                 np.float32) == 1


def test_to_device_rebuilds_wall_adjacency():
    """The wall-function path (mesh.wall_mask/wall_y) must reflect the
    NEW geometry after a host re-trace (to_device on the new poly)."""
    m1 = to_device(_channel_poly(h=0.1))
    m2 = to_device(_channel_poly(h=0.05))
    y1 = np.asarray(m1.wall_y)
    y2 = np.asarray(m2.wall_y)
    mask = np.asarray(m1.wall_mask) > 0
    assert mask.any()
    np.testing.assert_allclose(y2[mask], 0.5 * y1[mask], rtol=1e-5)


def test_rigid_motion_invariance():
    """Distances are invariant under rigid maps: translating every
    point leaves wall_distance unchanged (why solidBodyMotionFvMesh
    needs no refresh)."""
    import dataclasses

    poly = _channel_poly()
    d1 = wall_distance(poly)
    moved = dataclasses.replace(
        poly, points=poly.points + np.asarray([0.3, -0.2, 0.05]))
    # recompute derived geometry on the moved points
    moved = type(poly).from_topology(
        moved.points, poly.faces, poly.owner, poly.neighbour,
        poly.patches) if hasattr(type(poly), "from_topology") else None
    if moved is None:
        # geometric argument holds regardless; re-generate from a
        # translated blockMesh instead
        d = parse_string("""
vertices (
    (0.3 -0.2 0.05) (2.3 -0.2 0.05) (2.3 -0.1 0.05) (0.3 -0.1 0.05)
    (0.3 -0.2 0.06) (2.3 -0.2 0.06) (2.3 -0.1 0.06) (0.3 -0.1 0.06)
);
blocks ( hex (0 1 2 3 4 5 6 7) (30 10 1) simpleGrading (1 1 1) );
boundary (
    inlet { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls { type wall; faces ((1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
""")
        moved = blockmesh.generate(d)
    d2 = wall_distance(moved)
    np.testing.assert_allclose(d2, d1, atol=1e-10)
