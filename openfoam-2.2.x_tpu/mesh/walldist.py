"""Wall distance.

Reference: src/meshTools/cellDist/ (wallDist via MeshWave — a parallel
wavefront propagation). TPU build computes the geometric distance from
every cell centre to the nearest wall-face centre host-side with a
KD-tree (exact for the near-wall cells that matter to turbulence
models; MeshWave itself is a topological approximation)."""

from __future__ import annotations

import numpy as np


def wall_distance(poly, wall_types=("wall",)) -> np.ndarray:
    """[nC] distance to the nearest wall face centre (inf if no walls)."""
    wall_faces = []
    for p in poly.patches:
        if p.type in wall_types:
            wall_faces.append(np.arange(p.start, p.start + p.size))
    if not wall_faces:
        return np.full(poly.n_cells, np.inf)
    wf = np.concatenate(wall_faces)
    try:
        from scipy.spatial import cKDTree

        tree = cKDTree(poly.cf[wf])
        d, _ = tree.query(poly.c, k=1)
        return d
    except ImportError:  # chunked brute force fallback
        d = np.full(poly.n_cells, np.inf)
        centres = poly.cf[wf]
        for i in range(0, poly.n_cells, 4096):
            sl = slice(i, min(i + 4096, poly.n_cells))
            diff = poly.c[sl, None, :] - centres[None, :, :]
            d[sl] = np.sqrt((diff ** 2).sum(-1)).min(axis=1)
        return d


def wall_adjacency(poly, wall_types=("wall",)):
    """Static per-cell wall-adjacency data for wall functions
    (reference: the wall-function fvPatchFields act on patch faceCells).

    Returns (is_wall_cell [nC] f64 0/1, y_wall [nC] distance to the
    adjacent wall face along the patch delta, n_wall_faces [nC])."""
    n_cells = poly.n_cells
    isw = np.zeros(n_cells)
    yw = np.zeros(n_cells)
    cnt = np.zeros(n_cells)
    for p in poly.patches:
        if p.type not in wall_types:
            continue
        cells = poly.owner[p.slice]
        y = 1.0 / np.maximum(poly.delta_coeffs[p.slice], 1e-300)
        np.add.at(yw, cells, y)
        np.add.at(cnt, cells, 1.0)
        isw[cells] = 1.0
    yw = np.where(cnt > 0, yw / np.maximum(cnt, 1.0), 1.0)
    return isw, yw, cnt
