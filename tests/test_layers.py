"""Boundary-layer insertion (reference: autoLayerDriver — the LAYER
stage of snappyHexMesh)."""

import numpy as np
import jax.numpy as jnp

from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh, layers, to_device

DUCT = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 0.2 0) (0 0.2 0)
    (0 0 0.2) (1 0 0.2) (1 0.2 0.2) (0 0.2 0.2)
);
blocks ( hex (0 1 2 3 4 5 6 7) (10 4 4) simpleGrading (1 1 1) );
boundary
(
    inlet  { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    bottom { type wall; faces ((1 5 4 0)); }
    rest   { type wall; faces ((3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""


def _check(pm):
    assert pm.v.min() > 0, "negative volume"
    acc = np.zeros((pm.n_cells, 3))
    nif = pm.n_internal_faces
    np.add.at(acc, pm.owner[:nif], pm.sf[:nif])
    np.subtract.at(acc, pm.neighbour, pm.sf[:nif])
    np.add.at(acc, pm.owner[nif:], pm.sf[nif:])
    assert np.abs(acc).max() < 1e-9 * pm.mag_sf.max(), "open cells"


def test_layers_geometry_and_grading():
    """3 graded layers under the bottom wall: volume conserved, cells
    closed, first-layer height follows the expansion ratio, wall patch
    face count unchanged, wall stays at y=0."""
    pm = blockmesh.generate(parse_string(DUCT))
    v0 = pm.v.sum()
    nL = 3
    out = layers.add_layers(pm, "bottom", n_layers=nL, expansion=1.3)
    _check(out)
    assert out.n_cells == pm.n_cells + nL * 40      # 10x4 wall faces
    assert abs(out.v.sum() - v0) < 1e-12
    # wall patch: same size, still at y = 0
    wall = out.patch("bottom")
    assert wall.size == 40
    yw = out.cf[wall.slice][:, 1]
    assert np.abs(yw).max() < 1e-12
    # layer heights: cells above each wall face follow the grading
    own0 = out.owner[wall.slice]
    h = out.v[own0] / out.mag_sf[wall.slice]
    h1 = h.mean()
    # second layer cells: neighbours of the first across the
    # horizontal internal faces — find by cell centre height
    c = out.c[pm.n_cells:]                        # all layer cells
    ylev = np.unique(np.round(c[:, 1], 8))
    assert len(ylev) == nL
    # grading: spacing ratio ~ expansion
    gaps = np.diff(np.sort(ylev))
    assert gaps[-1] / gaps[0] > 1.15


def test_layers_fv_solve_runs():
    """icoFoam-style diffusion solve runs on the layered mesh and keeps
    a uniform field exactly."""
    from foamtpu.core.fields import vol_scalar
    from foamtpu.core.dimensions import dimViscosity
    from foamtpu.ops import fvm
    from foamtpu.solvers import linear

    pm = blockmesh.generate(parse_string(DUCT))
    out = layers.add_layers(pm, "bottom", n_layers=3)
    mesh = to_device(out)
    T = vol_scalar(mesh, 1.0, name="T")
    eqn = (fvm.ddt(mesh, T, T.data, jnp.asarray(1.0, mesh.v.dtype))
           - fvm.laplacian(mesh, jnp.asarray(1e-3, mesh.v.dtype), T,
                           gamma_dims=dimViscosity))
    data, perf = linear.solve(mesh, eqn, T.data,
                              {"solver": "PCG",
                               "preconditioner": "polynomial",
                               "tolerance": 1e-9, "relTol": 0.0})
    assert float(jnp.max(jnp.abs(data - 1.0))) < 1e-5


def test_layers_on_carved_body():
    """Layers on the snapped body of the octree pipeline: the full
    castellate -> snap -> layer chain (VERDICT r2 #5's 'Done'
    criterion)."""
    from foamtpu.mesh import snappy

    BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (10 10 10) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""
    # sphere STL at the centre
    import io

    def sphere_tris(r=0.25, c=(0.5, 0.5, 0.5), n=10):
        th = np.linspace(0, np.pi, n + 1)
        ph = np.linspace(0, 2 * np.pi, 2 * n + 1)
        cc = np.asarray(c)
        tris = []
        pt = lambda a, b: cc + r * np.array([
            np.sin(th[a]) * np.cos(ph[b]),
            np.sin(th[a]) * np.sin(ph[b]), np.cos(th[a])])
        for i in range(n):
            for j in range(2 * n):
                tris.append([pt(i, j), pt(i + 1, j), pt(i + 1, j + 1)])
                tris.append([pt(i, j), pt(i + 1, j + 1), pt(i, j + 1)])
        return np.asarray(tris)

    pm0 = blockmesh.generate(parse_string(BOX))
    tris = sphere_tris()
    pm1 = snappy.castellate(pm0, tris, (0.05, 0.05, 0.05),
                            body_patch="body")
    pm2 = snappy.snap(pm1, tris, body_patch="body")
    out = layers.add_layers(pm2, "body", n_layers=2, expansion=1.2)
    _check(out)
    body = out.patch("body")
    assert body.size == pm2.patch("body").size
    assert out.n_cells == pm2.n_cells + 2 * body.size
    # body faces still on the sphere to chord tolerance
    r = np.linalg.norm(out.cf[body.slice] - [0.5, 0.5, 0.5], axis=1)
    assert np.abs(r - 0.25).max() < 0.05
