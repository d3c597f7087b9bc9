"""Mesh partitioning (decomposePar equivalent).

Reference: src/parallel/decompose/ — decompositionMethod with
simple/hierarchical/scotch backends. On TPU there are no processor
directories: partitioning is a host-side cell REORDERING so each chip's
contiguous block of the global arrays is spatially compact, then GSPMD
shards the cell dimension (parallel/gspmd.py). Geometric recursive
coordinate bisection ~= the reference's `simple`/`hierarchical`
methods; scotch-quality graph partitioning can be slotted in later
without changing any caller."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def decompose(mesh, n_parts: int) -> np.ndarray:
    """Recursive coordinate bisection -> cellToProc [nC]."""
    c = np.asarray(mesh.c if hasattr(mesh, "c") else mesh.c)
    n_cells = c.shape[0]
    parts = np.zeros(n_cells, dtype=np.int64)

    def split(idx: np.ndarray, lo: int, hi: int) -> None:
        n = hi - lo
        if n <= 1:
            parts[idx] = lo
            return
        ext = c[idx].max(axis=0) - c[idx].min(axis=0)
        axis = int(np.argmax(ext))
        order = idx[np.argsort(c[idx, axis], kind="stable")]
        k = order.shape[0] * (n // 2) // n  # proportional split
        split(order[:k], lo, lo + n // 2)
        split(order[k:], lo + n // 2, hi)

    split(np.arange(n_cells), 0, n_parts)
    return parts


def cut_faces(mesh, parts: np.ndarray) -> int:
    nif = mesh.n_internal_faces
    own = np.asarray(mesh.owner)[:nif]
    nei = np.asarray(mesh.neighbour)
    return int((parts[own] != parts[nei]).sum())


def renumber_for(mesh, n_parts: int) -> np.ndarray:
    """Permutation `perm` (new order of old cell ids) putting each
    partition's cells contiguous — decomposePar as a relabelling."""
    parts = decompose(mesh, n_parts)
    return np.argsort(parts, kind="stable")
