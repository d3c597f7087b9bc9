"""Film-region surface mesh: a 2D FV mesh over primary-patch faces.

Reference: src/regionModels/regionModel/ + the extrudeToRegionMesh
utility (applications/utilities/mesh/generation/extrude2DMesh/...) —
the reference extrudes the patch into a one-cell-thick 3D region mesh;
here the film mesh IS the patch: faces become film cells, shared face
edges become film faces, built host-side once from PolyMesh topology.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import numpy as np

from ..mesh.core import PolyMesh


@dataclasses.dataclass(frozen=True)
class FilmMesh:
    """Surface FV mesh over nF patch faces with nE internal edges.

    Device arrays (jnp after to_device): a film 'cell' is a primary
    patch face; a film 'face' is an edge shared by two patch faces.
    Boundary edges (owned by a single face) are closed (zero flux) —
    the reference's filmRegion boundary conditions default the same
    way for walls.
    """

    # film cells (= patch faces)
    cf: Any            # [nF,3] face centres
    area: Any          # [nF] face areas
    n: Any             # [nF,3] unit normals pointing INTO the fluid
    # film faces (= shared edges)
    e_own: Any         # [nE] int32
    e_nbr: Any         # [nE] int32
    e_m: Any           # [nE,3] in-plane edge normal * edge length,
                       #        oriented own -> nbr
    e_dc: Any          # [nE] delta coefficients 1/|d| (diffusion)
    # coupling back to the primary mesh
    face_ids: Any      # [nF] global face indices in the primary mesh
    owner_cells: Any   # [nF] primary cells adjacent to each film cell
    b_rel: Any         # [nF] boundary-relative indices (into [nBf])

    @property
    def n_faces(self) -> int:
        return int(self.area.shape[0])

    @property
    def n_edges(self) -> int:
        return int(self.e_own.shape[0])


def build_film_mesh(poly: PolyMesh, patch_names: Sequence[str],
                    to_jax: bool = True) -> FilmMesh:
    """Host-side construction from the primary PolyMesh."""
    import jax.numpy as jnp

    names = set(patch_names)
    fids: List[int] = []
    for p in poly.patches:
        if p.name in names:
            fids.extend(range(p.start, p.start + p.size))
    if not fids:
        raise ValueError(f"no faces found for film patches {patch_names}")
    fids_a = np.asarray(fids, dtype=np.int64)
    nF = fids_a.shape[0]
    loc = {g: i for i, g in enumerate(fids)}

    cf = poly.cf[fids_a]
    sf = poly.sf[fids_a]
    mag = poly.mag_sf[fids_a]
    n_out = sf / np.maximum(mag, 1e-300)[:, None]
    n_in = -n_out                          # into the fluid domain

    # edge -> adjacent film cells
    edges = {}
    for i, g in enumerate(fids):
        npts = int(poly.face_npts[g])
        pts = poly.face_pts[g, :npts]
        for k in range(npts):
            a, b = int(pts[k]), int(pts[(k + 1) % npts])
            key = (a, b) if a < b else (b, a)
            edges.setdefault(key, []).append(i)

    e_own, e_nbr, e_m, e_dc = [], [], [], []
    for (a, b), cells in edges.items():
        if len(cells) != 2:
            continue                       # boundary edge: closed
        o, nb = cells
        pa, pb = poly.points[a], poly.points[b]
        t = pb - pa
        L = np.linalg.norm(t)
        if L < 1e-300:
            continue
        m = np.cross(n_in[o], t / L)       # in-plane, perp to edge
        d = cf[nb] - cf[o]
        if np.dot(m, d) < 0:
            m = -m
        dist = abs(np.dot(d, m))
        e_own.append(o)
        e_nbr.append(nb)
        e_m.append(m * L)
        e_dc.append(1.0 / max(dist, 1e-12))

    e_own_a = np.asarray(e_own, dtype=np.int32)
    e_nbr_a = np.asarray(e_nbr, dtype=np.int32)
    e_m_a = (np.asarray(e_m) if e_m
             else np.zeros((0, 3)))
    e_dc_a = np.asarray(e_dc)

    nif = poly.n_internal_faces
    owner_cells = poly.owner[fids_a].astype(np.int32)
    b_rel = (fids_a - nif).astype(np.int32)

    conv = jnp.asarray if to_jax else np.asarray
    return FilmMesh(
        cf=conv(cf), area=conv(mag), n=conv(n_in),
        e_own=conv(e_own_a), e_nbr=conv(e_nbr_a),
        e_m=conv(e_m_a), e_dc=conv(e_dc_a),
        face_ids=conv(fids_a.astype(np.int32)),
        owner_cells=conv(owner_cells), b_rel=conv(b_rel))
