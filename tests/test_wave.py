"""FaceCellWave / meshWave tests (reference:
src/meshTools/algorithms/MeshWave + wallPoint): the wave wall
distance matches the analytic distance on the cavity and the KD-tree
reference on a graded channel."""

import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh, to_device, wave

CAVITY = """
convertToMeters 0.1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (20 20 1) simpleGrading (1 1 1) );
boundary
(
    movingWall { type wall; faces ((3 7 6 2)); }
    fixedWalls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def test_meshwave_cavity_matches_analytic():
    mesh = to_device(blockmesh.generate(parse_string(CAVITY)))
    y = np.asarray(wave.wall_distance(mesh))
    c = np.asarray(mesh.c)
    # all four side walls: exact distance = min distance to the box
    exact = np.minimum.reduce([c[:, 0], 0.1 - c[:, 0],
                               c[:, 1], 0.1 - c[:, 1]])
    # wave distance measures to wall-face CENTRES: error <= half a
    # face width near corners; interior rows exact
    assert np.max(np.abs(y - exact)) < 0.0026   # dx/2 = 0.0025 + eps
    interior = (c[:, 0] > 0.02) & (c[:, 0] < 0.08)
    assert np.max(np.abs(y[interior] - exact[interior])) < 1e-5


def test_meshwave_matches_kdtree():
    from foamtpu.mesh import walldist

    pm = blockmesh.generate(parse_string(CAVITY))
    mesh = to_device(pm)
    y_wave = np.asarray(wave.wall_distance(mesh))
    y_kd = np.asarray(walldist.wall_distance(pm))
    # both approximate the same distance field; they agree to within
    # a face width (different wall representations: face centres vs
    # nearest surface point)
    assert np.max(np.abs(y_wave - y_kd)) < 0.006
