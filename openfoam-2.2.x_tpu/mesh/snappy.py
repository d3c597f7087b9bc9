"""snappyHexMesh (castellated stage) — STL-driven hex mesh carving.

Rebuild of reference: applications/utilities/mesh/generation/
snappyHexMesh/ + src/mesh/autoMesh/ (meshRefinement: the CASTELLATED
stage — cell removal against a tri-surface with locationInMesh side
selection) and src/triSurface/ (STL reading). The snap and layer
stages, and octree refinement, are not implemented yet (documented
gap): the result is the voxelised ("castellated") body on the
background mesh, exactly what `snappyHexMesh -castellated` (snap off)
produces on a single refinement level.

Host-side numpy throughout (mesh generation is offline, like the
reference binary).
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Tuple

import numpy as np

from .core import Patch, PolyMesh


# ---------------------------------------------------------------------------
# triSurface: STL reading (reference: src/triSurface/triSurface/
# interfaces/STL/)
# ---------------------------------------------------------------------------


def read_stl(path: str) -> np.ndarray:
    """STL (ascii or binary) -> triangles [nT, 3, 3]."""
    with open(path, "rb") as f:
        head = f.read(5)
    if head == b"solid":
        # could still be binary with a 'solid' header; try ascii first
        try:
            return _read_stl_ascii(path)
        except ValueError:
            pass
    return _read_stl_binary(path)


def _read_stl_ascii(path: str) -> np.ndarray:
    tris: List[List[List[float]]] = []
    cur: List[List[float]] = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "vertex":
                cur.append([float(t[1]), float(t[2]), float(t[3])])
                if len(cur) == 3:
                    tris.append(cur)
                    cur = []
    if not tris:
        raise ValueError("no ascii facets")
    return np.asarray(tris, dtype=float)


def _read_stl_binary(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        f.read(80)
        (n,) = struct.unpack("<I", f.read(4))
        data = np.frombuffer(f.read(n * 50), dtype=np.uint8)
    rec = data.reshape(n, 50)
    floats = rec[:, :48].copy().view("<f4").reshape(n, 4, 3)
    return floats[:, 1:4, :].astype(float)


def write_stl(path: str, tris: np.ndarray, name: str = "surface") -> None:
    with open(path, "w") as f:
        f.write(f"solid {name}\n")
        for t in tris:
            n = np.cross(t[1] - t[0], t[2] - t[0])
            n = n / max(np.linalg.norm(n), 1e-300)
            f.write(f" facet normal {n[0]} {n[1]} {n[2]}\n"
                    "  outer loop\n")
            for v in t:
                f.write(f"   vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write(f"endsolid {name}\n")


# ---------------------------------------------------------------------------
# inside/outside classification (reference: meshRefinement uses the
# octree searchableSurface; here vectorised ray-parity casting)
# ---------------------------------------------------------------------------


def points_inside(tris: np.ndarray, pts: np.ndarray,
                  chunk: int = 20000) -> np.ndarray:
    """Ray-parity inside test, Moller-Trumbore vectorised over
    (points x triangles) in chunks. The ray direction is a fixed
    'generic' tilt so rays from lattice points never pass through
    triangle edges/vertices of axis-aligned geometry (the classic
    double-count parity failure)."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0
    d = np.array([0.9877132, 0.12344519, 0.0954103])
    d = d / np.linalg.norm(d)
    h = np.cross(d, e2)                     # [nT,3]
    a = np.einsum("td,td->t", e1, h)
    ok = np.abs(a) > 1e-14
    inv_a = np.where(ok, 1.0 / np.where(ok, a, 1.0), 0.0)
    out = np.zeros(pts.shape[0], dtype=bool)
    for s in range(0, pts.shape[0], chunk):
        p = pts[s:s + chunk]
        sv = p[:, None, :] - v0[None, :, :]          # [nP,nT,3]
        u = np.einsum("ptd,td->pt", sv, h) * inv_a
        q = np.cross(sv, e1[None, :, :])
        vpar = np.einsum("ptd,d->pt", q, d) * inv_a
        t_hit = np.einsum("ptd,td->pt", q, e2) * inv_a
        hit = (ok[None, :] & (u >= 0) & (vpar >= 0)
               & (u + vpar <= 1) & (t_hit > 1e-12))
        out[s:s + chunk] = (hit.sum(axis=1) % 2) == 1
    return out


# ---------------------------------------------------------------------------
# castellation: remove cells on the far side of the surface
# ---------------------------------------------------------------------------


def castellate(pm: PolyMesh, tris: np.ndarray,
               location_in_mesh, body_patch: str = "body") -> PolyMesh:
    """Keep the cells on `location_in_mesh`'s side of the surface; the
    exposed internal faces become the `body_patch` wall (reference:
    meshRefinement::splitMesh / the castellated stage)."""
    loc = np.asarray(location_in_mesh, dtype=float).reshape(1, 3)
    inside = points_inside(tris, pm.c)
    keep = inside == bool(points_inside(tris, loc)[0])
    if not keep.any():
        raise ValueError("castellate would remove every cell")
    nif = pm.n_internal_faces
    own, nei = pm.owner, pm.neighbour
    new_id = np.cumsum(keep) - 1

    # classify faces
    both = keep[own[:nif]] & keep[nei]
    o_only = keep[own[:nif]] & ~keep[nei]
    n_only = ~keep[own[:nif]] & keep[nei]

    def face_rows(idx, flip=False):
        fp = pm.face_pts[idx]
        npts = pm.face_npts[idx]
        if flip:
            fp = fp.copy()
            for r in range(fp.shape[0]):
                k = npts[r]
                fp[r, :k] = fp[r, :k][::-1]
        return fp, npts

    # internal faces kept: enforce owner < neighbour (flip if needed)
    int_idx = np.nonzero(both)[0]
    io = new_id[own[int_idx]]
    ineb = new_id[nei[int_idx]]
    swap = io > ineb
    fp_i, np_i = face_rows(int_idx)
    fp_sw, _ = face_rows(int_idx[swap], flip=True)
    fp_i[swap] = fp_sw
    io2 = np.where(swap, ineb, io)
    ine2 = np.where(swap, io, ineb)
    order = np.lexsort((ine2, io2))
    fp_i, np_i, io2, ine2 = fp_i[order], np_i[order], io2[order], ine2[order]

    # boundary faces: original patches (owner kept), then the body
    faces_b: List[np.ndarray] = []
    npts_b: List[np.ndarray] = []
    own_b: List[np.ndarray] = []
    patches: List[Patch] = []
    start = fp_i.shape[0]
    for p in pm.patches:
        idx = np.arange(p.start, p.start + p.size)
        idx = idx[keep[own[idx]]]
        fp, npts = face_rows(idx)
        faces_b.append(fp)
        npts_b.append(npts)
        own_b.append(new_id[own[idx]])
        patches.append(Patch(name=p.name, type=p.type, start=start,
                             size=idx.shape[0]))
        start += idx.shape[0]
    # body faces: owner-kept keep orientation; neighbour-kept flip
    bo_idx = np.nonzero(o_only)[0]
    bn_idx = np.nonzero(n_only)[0]
    fp_bo, np_bo = face_rows(bo_idx)
    fp_bn, np_bn = face_rows(bn_idx, flip=True)
    faces_b += [fp_bo, fp_bn]
    npts_b += [np_bo, np_bn]
    own_b += [new_id[own[bo_idx]], new_id[nei[bn_idx]]]
    n_body = bo_idx.shape[0] + bn_idx.shape[0]
    patches.append(Patch(name=body_patch, type="wall", start=start,
                         size=n_body))

    max_pts = pm.face_pts.shape[1]

    def pad_cat(lst):
        return (np.concatenate(lst, axis=0) if lst
                else np.zeros((0, max_pts), dtype=pm.face_pts.dtype))

    face_pts = np.concatenate([fp_i, pad_cat(faces_b)], axis=0)
    face_npts = np.concatenate([np_i] + npts_b, axis=0)
    owner = np.concatenate([io2] + own_b, axis=0)
    neighbour = ine2

    # compact points
    used = np.zeros(pm.n_points, dtype=bool)
    valid = (np.arange(max_pts)[None, :]
             < face_npts[:, None]) & (face_pts >= 0)
    used[face_pts[valid]] = True
    pmap = np.cumsum(used) - 1
    face_pts = np.where(valid, pmap[np.clip(face_pts, 0, None)], -1)
    points = pm.points[used]

    return PolyMesh(points=points, face_pts=face_pts,
                    face_npts=face_npts, owner=owner,
                    neighbour=neighbour, patches=patches)


# ---------------------------------------------------------------------------
# snappyHexMeshDict driver (castellated only)
# ---------------------------------------------------------------------------


def from_dict(case_dir: str, d, pm: PolyMesh) -> PolyMesh:
    """system/snappyHexMeshDict -> castellated mesh. Reads the first
    triSurfaceMesh entry in geometry{} from constant/triSurface/."""
    geom = d.get("geometry")
    stl_file = None
    body = "body"
    if geom is not None:
        for name, spec in geom.items():
            if not hasattr(spec, "get"):
                continue
            if str(spec.get("type", "")) == "triSurfaceMesh":
                stl_file = str(spec.get("file", name)).strip('"')
                body = str(spec.get("name", os.path.splitext(
                    str(name))[0]))
                break
    if stl_file is None:
        raise ValueError("snappyHexMeshDict: no triSurfaceMesh geometry")
    cc = d.get("castellatedMeshControls", {})
    loc = cc.get("locationInMesh", (0.0, 0.0, 0.0))
    loc = np.asarray(loc, dtype=float).reshape(3)
    tris = read_stl(os.path.join(case_dir, "constant", "triSurface",
                                 stl_file))
    return castellate(pm, tris, loc, body_patch=body)
