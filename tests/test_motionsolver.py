"""fvMotionSolver: displacementLaplacian (reference:
src/fvMotionSolver/fvMotionSolvers/displacementLaplacian/)."""

import jax.numpy as jnp
import numpy as np

from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh, to_device
from foamtpu.mesh.motionsolver import DisplacementLaplacian
from foamtpu.mesh import moving

BOX = """
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1) );
blocks ( hex (0 1 2 3 4 5 6 7) (12 12 1) simpleGrading (1 1 1) );
boundary (
  movingWall { type wall; faces ((3 7 6 2)); }
  fixedWalls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0)); }
  frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def test_displacement_laplacian_smooth_deformation():
    """Move the top wall up by 0.1: the interior deforms smoothly
    (monotone decay from the moving wall, all volumes positive), the
    fixed boundary stays put, and the geometry rebuild is consistent
    (total volume grows by the swept amount)."""
    pm = blockmesh.generate(parse_string(BOX))
    mesh = to_device(pm)
    ms = DisplacementLaplacian(pm, mesh, ["movingWall"],
                               diffusivity="inverseDistance")
    new_pts = ms.solve_points({"movingWall": jnp.asarray([0.0, 0.1, 0.0])})
    pts = np.asarray(new_pts)
    p0 = pm.points
    # fixed boundary points unchanged
    fixed = (np.abs(p0[:, 1]) < 1e-12) | (np.abs(p0[:, 0]) < 1e-12) \
        | (np.abs(p0[:, 0] - 1.0) < 1e-12)
    top = np.abs(p0[:, 1] - 1.0) < 1e-12
    assert np.allclose(pts[fixed & ~top], p0[fixed & ~top], atol=1e-7)
    assert np.allclose(pts[top][:, 1], 1.1, atol=1e-6)
    dy = pts[:, 1] - p0[:, 1]
    assert (dy >= -1e-7).all() and dy.max() <= 0.1 + 1e-6
    # interior displacement increases monotonically with height (bin
    # the unique y-levels of the original lattice)
    levels = np.unique(np.round(p0[:, 1], 9))
    means = [dy[np.round(p0[:, 1], 9) == lv].mean() for lv in levels]
    assert all(b >= a - 1e-8 for a, b in zip(means, means[1:]))
    # valid deformed geometry
    topo = moving.topo_from_poly(pm, np.asarray(mesh.v).dtype)
    mesh2 = moving.update_geometry(mesh, jnp.asarray(pts, mesh.v.dtype),
                                   topo)
    v2 = np.asarray(mesh2.v)
    assert (v2 > 0).all()
    assert abs(v2.sum() - (np.asarray(mesh.v).sum() + 0.1 * 1.0 * 0.1)) \
        < 1e-6
