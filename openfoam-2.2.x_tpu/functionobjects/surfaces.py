"""sampledSurfaces — cuttingPlane / isoSurface extraction + VTK
surface writer.

Rebuild of reference: src/sampling/sampledSurface/{isoSurface,
cuttingPlane}/ + surfaceWriters/vtk/. The extraction runs host-side
between jitted chunks (as all functionObjects here do): every cell is
fan-decomposed into tetrahedra (cell centre, face centre, two
consecutive face points — the reference's tet decomposition), point
and face values come from inverse-distance cell averaging, and a
vectorised marching-tetrahedra pass emits the triangulated surface
with linearly interpolated field values at the iso crossings.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .base import FunctionObject, register


def _mesh_tets(pm_dev):
    """Tet table [nT,4] of vertex indices into the stacked vertex array
    [cells | faces | points] + the stacked positions (host, cached)."""
    mesh = pm_dev
    nC = mesh.n_cells
    nF = mesh.n_faces
    c = np.asarray(mesh.c)
    cf = np.asarray(mesh.cf)
    # recover face->points from the device mesh? not stored; the caller
    # passes the PolyMesh instead.
    raise RuntimeError("use _build_tables(poly_mesh)")


def _build_tables(pm):
    """(positions [nV,3], tets [nT,4], pt_cell_w) for a PolyMesh."""
    nC, nF, nP = pm.n_cells, pm.n_faces, pm.n_points
    pos = np.concatenate([pm.c, pm.cf, pm.points], axis=0)
    tets = []
    for f in range(nF):
        k = pm.face_npts[f]
        own = pm.owner[f]
        pts = pm.face_pts[f, :k]
        for e in range(k):
            a, b = pts[e], pts[(e + 1) % k]
            tets.append((own, nC + f, nC + nF + a, nC + nF + b))
        if f < pm.n_internal_faces:
            nei = pm.neighbour[f]
            for e in range(k):
                a, b = pts[e], pts[(e + 1) % k]
                tets.append((nei, nC + f, nC + nF + b, nC + nF + a))
    tets = np.asarray(tets, dtype=np.int64)
    # inverse-distance point<-cell weights (CSR-ish via repeat)
    pt_cells: List[List[int]] = [[] for _ in range(nP)]
    for f in range(nF):
        k = pm.face_npts[f]
        for pt in pm.face_pts[f, :k]:
            pt_cells[pt].append(pm.owner[f])
            if f < pm.n_internal_faces:
                pt_cells[pt].append(pm.neighbour[f])
    rows, cols, wts = [], [], []
    for p, cl in enumerate(pt_cells):
        cl = list(set(int(x) for x in cl))
        if not cl:
            continue
        d = np.linalg.norm(pm.c[cl] - pm.points[p], axis=1)
        w = 1.0 / np.maximum(d, 1e-12)
        w /= w.sum()
        rows += [p] * len(cl)
        cols += cl
        wts += list(w)
    return pos, tets, (np.asarray(rows), np.asarray(cols),
                       np.asarray(wts))


def _vertex_values(pm, cell_vals: np.ndarray, pt_w) -> np.ndarray:
    """Stack [cells | faces | points] values for a per-cell field."""
    nC, nF, nP = pm.n_cells, pm.n_faces, pm.n_points
    nif = pm.n_internal_faces
    tail = cell_vals.shape[1:]
    fvals = np.zeros((nF,) + tail)
    w = pm.weights[:nif]
    if tail:
        w = w[:, None]
    fvals[:nif] = (w * cell_vals[pm.owner[:nif]]
                   + (1.0 - w) * cell_vals[pm.neighbour])
    fvals[nif:] = cell_vals[pm.owner[nif:]]
    pvals = np.zeros((nP,) + tail)
    rows, cols, wts = pt_w
    wv = wts[:, None] if tail else wts
    np.add.at(pvals, rows, wv * cell_vals[cols])
    return np.concatenate([cell_vals, fvals, pvals], axis=0)


# marching-tetrahedra edge tables: for each of the 16 sign cases, the
# triangles as triples of tet-edge ids; edges: 0=01 1=02 2=03 3=12
# 4=13 5=23
_EDGE_V = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
_CASES: Dict[int, List[Tuple[int, int, int]]] = {
    0b0001: [(0, 1, 2)],
    0b0010: [(0, 4, 3)],
    0b0100: [(1, 3, 5)],
    0b1000: [(2, 5, 4)],
    0b0011: [(1, 2, 4), (1, 4, 3)],
    0b0101: [(0, 3, 5), (0, 5, 2)],
    0b1001: [(0, 1, 5), (0, 5, 4)],
    0b0110: [(0, 1, 5), (0, 5, 4)],
    0b1010: [(0, 3, 5), (0, 5, 2)],
    0b1100: [(1, 2, 4), (1, 4, 3)],
    0b0111: [(2, 5, 4)],
    0b1011: [(1, 3, 5)],
    0b1101: [(0, 4, 3)],
    0b1110: [(0, 1, 2)],
}


def marching_tets(pos, tets, psi, iso, fields: Dict[str, np.ndarray]):
    """Triangulate psi==iso over the tet set; returns (verts [nV,3],
    tris [nT,3], {name: vertex values})."""
    v = psi[tets]                                   # [nT,4]
    s = (v > iso).astype(np.int32)
    code = s[:, 0] | (s[:, 1] << 1) | (s[:, 2] << 2) | (s[:, 3] << 3)
    all_tris = []
    all_pts = []
    out_fields: Dict[str, List[np.ndarray]] = {k: [] for k in fields}
    base = 0
    for c_, tris in _CASES.items():
        sel = np.nonzero(code == c_)[0]
        if sel.size == 0:
            continue
        tsel = tets[sel]
        vsel = v[sel]
        # intersection point on each tet edge
        exyz = {}
        efld = {k: {} for k in fields}
        for e in range(6):
            a, b = _EDGE_V[e]
            va, vb = vsel[:, a], vsel[:, b]
            tpar = (iso - va) / np.where(np.abs(vb - va) < 1e-30, 1e-30,
                                         vb - va)
            tpar = np.clip(tpar, 0.0, 1.0)[:, None]
            pa = pos[tsel[:, a]]
            pb = pos[tsel[:, b]]
            exyz[e] = pa + tpar * (pb - pa)
            for k, fv in fields.items():
                fa = fv[tsel[:, a]]
                fb = fv[tsel[:, b]]
                tp = tpar if fa.ndim == 2 else tpar[:, 0]
                efld[k][e] = fa + tp * (fb - fa)
        for tri in tris:
            pts = np.stack([exyz[e] for e in tri], axis=1)  # [n,3,3]
            n = pts.shape[0]
            all_pts.append(pts.reshape(-1, 3))
            all_tris.append(
                base + np.arange(3 * n).reshape(n, 3))
            base += 3 * n
            for k in fields:
                fv = np.stack([efld[k][e] for e in tri], axis=1)
                out_fields[k].append(fv.reshape(
                    (-1,) + fv.shape[2:]))
    if not all_pts:
        shape = (0, 3)
        return (np.zeros(shape), np.zeros((0, 3), dtype=np.int64),
                {k: np.zeros((0,) + fields[k].shape[1:])
                 for k in fields})
    return (np.concatenate(all_pts, axis=0),
            np.concatenate(all_tris, axis=0),
            {k: np.concatenate(vs, axis=0)
             for k, vs in out_fields.items()})


def write_vtk_surface(path: str, verts, tris, fields) -> None:
    """Legacy-VTK polydata writer (reference: vtkSurfaceWriter)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 2.0\nsampledSurface\nASCII\n")
        f.write("DATASET POLYDATA\n")
        f.write(f"POINTS {verts.shape[0]} float\n")
        for p in verts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
        f.write(f"POLYGONS {tris.shape[0]} {4 * tris.shape[0]}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
        if fields:
            f.write(f"POINT_DATA {verts.shape[0]}\n")
            for name, v in fields.items():
                if v.ndim == 1:
                    f.write(f"SCALARS {name} float 1\nLOOKUP_TABLE "
                            "default\n")
                    for x in v:
                        f.write(f"{x}\n")
                else:
                    f.write(f"VECTORS {name} float\n")
                    for x in v:
                        f.write(f"{x[0]} {x[1]} {x[2]}\n")


class SampledSurfaces(FunctionObject):
    """controlDict `surfaces` functionObject (reference:
    src/sampling/sampledSurfaces/): cuttingPlane + isoSurface,
    surfaceFormat vtk."""

    def __init__(self, name, spec, case):
        self.name = name
        self.case = case
        self.fields = [str(x) for x in spec.get("fields", [])]
        self.surfaces = []
        surf = spec.get("surfaces", [])
        items = list(surf) if isinstance(surf, list) else [surf]
        i = 0
        while i < len(items):
            sname = str(items[i])
            sspec = items[i + 1] if i + 1 < len(items) else None
            i += 2
            if not hasattr(sspec, "get"):
                i -= 1
                continue
            self.surfaces.append((sname, sspec))
        self._tables = None

    def _ensure_tables(self):
        if self._tables is None:
            pm = self.case.poly_mesh
            self._tables = _build_tables(pm)
        return self._tables

    def execute(self, time_name, state):
        pm = self.case.poly_mesh
        pos, tets, pt_w = self._ensure_tables()

        def cellvals(fname):
            if fname in state and hasattr(state[fname], "data"):
                return np.asarray(state[fname].data)
            v = state.get(fname)
            return None if v is None else np.asarray(v)

        fields = {}
        for fn in self.fields:
            cv = cellvals(fn)
            if cv is not None:
                fields[fn] = _vertex_values(pm, cv, pt_w)

        for sname, sspec in self.surfaces:
            stype = str(sspec.get("type", "cuttingPlane"))
            if stype in ("cuttingPlane", "plane"):
                pnd = sspec.get("pointAndNormalDict", sspec)
                p0 = np.asarray(pnd.get("basePoint",
                                        pnd.get("point", (0, 0, 0))),
                                float).reshape(3)
                nrm = np.asarray(pnd.get("normalVector",
                                         pnd.get("normal", (0, 0, 1))),
                                 float).reshape(3)
                nrm = nrm / max(np.linalg.norm(nrm), 1e-300)
                psi = (pos - p0) @ nrm
                iso = 0.0
            elif stype == "isoSurface":
                fname = str(sspec.get("isoField"))
                cv = cellvals(fname)
                if cv is None:
                    continue
                if cv.ndim == 2:
                    cv = np.linalg.norm(cv, axis=1)
                psi = _vertex_values(pm, cv, pt_w)
                iso = float(sspec.get("isoValue", 0.5))
            elif stype in ("patch", "patchSurface"):
                # reference: sampledPatch — fan-triangulated patch
                # faces carrying the wall-adjacent cell values
                pnames = [str(x) for x in
                          (sspec.get("patches")
                           or [sspec.get("patchName", "")])]
                verts_l, tris_l, own_l = [], [], []
                for p_ in pm.patches:
                    if p_.name not in pnames:
                        continue
                    for fidx in range(p_.start, p_.start + p_.size):
                        k = pm.face_npts[fidx]
                        fp = pm.face_pts[fidx, :k]
                        base = len(verts_l)
                        verts_l.extend(pm.points[fp])
                        for j in range(1, k - 1):
                            tris_l.append((base, base + j,
                                           base + j + 1))
                            own_l.append(pm.owner[fidx])
                if not tris_l:
                    continue
                verts = np.asarray(verts_l)
                tris = np.asarray(tris_l, np.int64)
                # vertex values: owner-cell value of every incident
                # triangle (duplicated vertices keep this local)
                fvals = {}
                for fn in self.fields:
                    cv = cellvals(fn)
                    if cv is None:
                        continue
                    vv = np.zeros((verts.shape[0],) + cv.shape[1:])
                    for t_i, o in zip(tris, own_l):
                        for vi in t_i:
                            vv[vi] = cv[o]
                    fvals[fn] = vv
                out = os.path.join(self.case.dir, "postProcessing",
                                   self.name, time_name,
                                   f"{sname}.vtk")
                write_vtk_surface(out, verts, tris, fvals)
                continue
            else:
                continue
            verts, tris, fvals = marching_tets(pos, tets, psi, iso,
                                               fields)
            out = os.path.join(self.case.dir, "postProcessing",
                               self.name, time_name,
                               f"{sname}.vtk")
            write_vtk_surface(out, verts, tris, fvals)


register("surfaces", SampledSurfaces)
register("sampledSurfaces", SampledSurfaces)
