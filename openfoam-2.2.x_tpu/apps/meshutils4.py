"""meshutils4 — mesh converters + surface/misc utilities, batch 4.

Rebuilds of reference utilities:
  applications/utilities/mesh/conversion/{tetgenToFoam,ideasUnvToFoam,
    plot3dToFoam,mshToFoam,gambitToFoam,vtkUnstructuredToFoam}
  applications/utilities/surface/{surfaceAdd,surfaceClean,
    surfacePointMerge,surfaceOrient,surfaceInertia,surfaceSplitByPatch,
    surfaceMeshTriangulate}
  applications/utilities/mesh/manipulation/{insideCells,selectCells,
    splitMesh}
  applications/utilities/miscellaneous/{expandDictionary,foamInfoExec,
    patchSummary}
  applications/utilities/preProcessing/{engineSwirl,dsmcInitialise,
    mdInitialise,foamUpgradeFvSolution}
  applications/utilities/postProcessing/lagrangian/steadyParticleTracks

All converters reuse mesh/gmsh.py::to_polymesh (volume cells + boundary
surface elements -> face-addressed polyMesh), so each format needs only
its parser.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Tuple

import numpy as np

from ..core.dictionary import FoamDict, parse_file
from ..io import polymesh as mesh_io
from ..mesh.gmsh import to_polymesh
from ..mesh.snappy import read_stl, write_stl

# ---------------------------------------------------------------------------
# format parsers -> (points, cells, surfs, phys) for gmsh.to_polymesh
# ---------------------------------------------------------------------------


def read_tetgen(base: str):
    """tetgenToFoam (reference: .../conversion/tetgenToFoam/): read
    <base>.node + <base>.ele (+ optional <base>.face boundary markers)."""
    def toks(path):
        out = []
        for ln in open(path):
            ln = ln.split("#")[0]
            out.extend(ln.split())
        return out

    t = toks(base + ".node")
    npts, dim = int(t[0]), int(t[1])
    nattr, nmark = int(t[2]), int(t[3])
    stride = 1 + dim + nattr + nmark
    body = t[4:4 + npts * stride]
    ids = np.asarray([int(body[i * stride]) for i in range(npts)])
    off = int(ids.min())  # tetgen numbers from 0 or 1
    points = np.asarray(
        [[float(body[i * stride + 1 + d]) for d in range(3)]
         for i in range(npts)])

    t = toks(base + ".ele")
    nele, npercell = int(t[0]), int(t[1])
    nattr_e = int(t[2])
    stride = 1 + npercell + nattr_e
    body = t[3:3 + nele * stride]
    cells = []
    for i in range(nele):
        nodes = [int(body[i * stride + 1 + j]) - off
                 for j in range(4)]
        cells.append((4, nodes))

    surfs: List[Tuple[int, List[int]]] = []
    phys: Dict[int, str] = {}
    fpath = base + ".face"
    if os.path.exists(fpath):
        t = toks(fpath)
        nf, nmark = int(t[0]), int(t[1])
        stride = 4 + nmark
        body = t[2:2 + nf * stride]
        for i in range(nf):
            nodes = [int(body[i * stride + 1 + j]) - off
                     for j in range(3)]
            mark = int(body[i * stride + 4]) if nmark else 0
            surfs.append((mark, nodes))
            phys.setdefault(mark, f"patch{mark}")
    return points, cells, surfs, phys


_UNV_VOL = {111: (4, [0, 1, 2, 3]),          # tet4
            115: (5, [0, 1, 2, 3, 4, 5, 6, 7]),  # hex8
            112: (6, [0, 1, 2, 3, 4, 5])}    # wedge6


def read_unv(path: str):
    """ideasUnvToFoam (reference: .../conversion/ideasUnvToFoam/):
    I-DEAS universal file datasets 2411 (nodes), 2412 (elements),
    2467/2452 (groups -> patches)."""
    lines = open(path).read().split("\n")
    i = 0
    sections: Dict[int, List[str]] = {}
    while i < len(lines):
        if lines[i].strip() == "-1":
            i += 1
            if i >= len(lines):
                break
            try:
                ds = int(lines[i].strip())
            except ValueError:
                continue
            i += 1
            body = []
            while i < len(lines) and lines[i].strip() != "-1":
                body.append(lines[i])
                i += 1
            i += 1
            sections.setdefault(ds, []).extend(body)
        else:
            i += 1
    # nodes
    nid_map: Dict[int, int] = {}
    pts: List[List[float]] = []
    body = sections.get(2411, [])
    for k in range(0, len(body) - 1, 2):
        hdr = body[k].split()
        if len(hdr) < 1:
            continue
        nid = int(hdr[0])
        xyz = [float(x.replace("D", "E").replace("d", "e"))
               for x in body[k + 1].split()]
        nid_map[nid] = len(pts)
        pts.append(xyz[:3])
    # elements
    cells: List[Tuple[int, List[int]]] = []
    tris: Dict[int, List[int]] = {}   # element id -> surface nodes
    body = sections.get(2412, [])
    k = 0
    while k < len(body):
        hdr = body[k].split()
        if len(hdr) < 6:
            k += 1
            continue
        eid, fed = int(hdr[0]), int(hdr[1])
        nnodes = int(hdr[5])
        k += 1
        if fed in (11, 21, 22):      # beam elements carry an extra record
            k += 1
        nodes: List[int] = []
        while len(nodes) < nnodes and k < len(body):
            nodes.extend(int(x) for x in body[k].split())
            k += 1
        nodes = [nid_map[n] for n in nodes[:nnodes]]
        if fed in _UNV_VOL:
            et, perm = _UNV_VOL[fed]
            cells.append((et, [nodes[p] for p in perm]))
        elif fed in (41, 91):        # thin-shell tri
            tris[eid] = nodes
        elif fed in (44, 94):        # thin-shell quad
            tris[eid] = nodes
    # groups -> patches
    surfs: List[Tuple[int, List[int]]] = []
    phys: Dict[int, str] = {}
    gid = 0
    for ds in (2467, 2452, 2435):
        body = sections.get(ds, [])
        k = 0
        while k < len(body):
            hdr = body[k].split()
            if len(hdr) == 8:
                nent = int(hdr[7])
                name = body[k + 1].strip() or f"patch{gid}"
                k += 2
                ids: List[int] = []
                rows = (nent + 1) // 2
                for r in range(rows):
                    f = body[k + r].split()
                    for c in range(0, len(f), 4):
                        ids.append(int(f[c + 1]))
                k += rows
                members = [tris[e] for e in ids if e in tris]
                if members:
                    phys[gid] = name
                    surfs.extend((gid, m) for m in members)
                    gid += 1
            else:
                k += 1
    return np.asarray(pts), cells, surfs, phys


def read_plot3d(path: str):
    """plot3dToFoam (reference: .../conversion/plot3dToFoam/):
    single/multi-block formatted whole PLOT3D grid -> hex cells."""
    lines = open(path).read().split("\n")
    first_line = next(ln for ln in lines if ln.split())
    toks: List[str] = []
    for ln in lines:
        toks.extend(ln.replace(",", " ").split())
    it = iter(toks)

    def ni():
        return int(next(it))

    def nf():
        return float(next(it))

    # multi-block files lead with a lone block count on its own line;
    # single-block files lead with the "ni nj nk" triple
    if len(first_line.split()) == 1:
        nblocks = ni()
        dims = [(ni(), ni(), ni()) for _ in range(nblocks)]
    else:
        dims = [(ni(), ni(), ni())]
    points_all = []
    cells: List[Tuple[int, List[int]]] = []
    offset = 0
    for (nx, ny, nz) in dims:
        n = nx * ny * nz
        xs = np.asarray([nf() for _ in range(n)])
        ys = np.asarray([nf() for _ in range(n)])
        zs = np.asarray([nf() for _ in range(n)])
        pts = np.stack([xs, ys, zs], axis=1)  # i fastest (Fortran order)
        points_all.append(pts)

        def pid(i, j, k):
            return offset + i + nx * (j + ny * k)

        for k in range(nz - 1):
            for j in range(ny - 1):
                for i in range(nx - 1):
                    cells.append((5, [
                        pid(i, j, k), pid(i + 1, j, k),
                        pid(i + 1, j + 1, k), pid(i, j + 1, k),
                        pid(i, j, k + 1), pid(i + 1, j, k + 1),
                        pid(i + 1, j + 1, k + 1), pid(i, j + 1, k + 1)]))
        offset += n
    return np.concatenate(points_all), cells, [], {}


def read_adventure_msh(path: str):
    """mshToFoam (reference: .../conversion/mshToFoam/): the Adventure
    .msh format — point count, points, cell count, 8-node hex (or
    4-node tet) connectivity."""
    toks: List[str] = []
    for ln in open(path):
        toks.extend(ln.split())
    it = iter(toks)
    npts = int(next(it))
    pts = np.asarray([[float(next(it)) for _ in range(3)]
                      for _ in range(npts)])
    ncells = int(next(it))
    rest = [int(x) for x in it]
    per = len(rest) // ncells if ncells else 0
    cells = []
    for c in range(ncells):
        nodes = rest[c * per:(c + 1) * per]
        if per == 8:
            cells.append((5, nodes))
        elif per == 4:
            cells.append((4, nodes))
        else:
            raise ValueError(f"mshToFoam: {per}-node cells unsupported")
    return pts, cells, [], {}


_GAMBIT_HEX = [0, 1, 3, 2, 4, 5, 7, 6]   # gambit brick -> gmsh hex order

# GAMBIT neutral per-element local face node tables (1-indexed face ids
# in the file; tables are 0-indexed into the element's node list)
_GAMBIT_FACES = {
    4: ((0, 1, 5, 4), (1, 3, 7, 5), (3, 2, 6, 7),
        (2, 0, 4, 6), (1, 0, 2, 3), (4, 5, 7, 6)),   # brick
    6: ((1, 0, 2), (0, 1, 3), (1, 2, 3), (2, 0, 3)),  # tet
    5: ((0, 1, 4, 3), (1, 2, 5, 4), (2, 0, 3, 5),
        (0, 2, 1), (3, 4, 5)),                        # wedge
}


def read_gambit(path: str):
    """gambitToFoam (reference: .../conversion/gambitToFoam/): GAMBIT
    neutral file — NODAL COORDINATES, ELEMENTS/CELLS, BOUNDARY
    CONDITIONS sections."""
    lines = open(path).read().split("\n")
    i = 0
    pts: List[List[float]] = []
    cells: List[Tuple[int, List[int]]] = []
    cell_nodes: List[List[int]] = []
    surfs: List[Tuple[int, List[int]]] = []
    phys: Dict[int, str] = {}
    while i < len(lines):
        t = lines[i].strip()
        if t.startswith("NODAL COORDINATES"):
            i += 1
            while not lines[i].strip().startswith("ENDOFSECTION"):
                parts = lines[i].split()
                pts.append([float(x) for x in parts[1:4]])
                i += 1
        elif t.startswith("ELEMENTS/CELLS"):
            i += 1
            while not lines[i].strip().startswith("ENDOFSECTION"):
                parts = lines[i].split()
                etype, nn = int(parts[1]), int(parts[2])
                nodes = [int(x) - 1 for x in parts[3:3 + nn]]
                i += 1
                while len(nodes) < nn:
                    nodes.extend(int(x) - 1 for x in lines[i].split())
                    i += 1
                cell_nodes.append(nodes)
                if etype == 4 and nn == 8:       # brick
                    cells.append((5, [nodes[p] for p in _GAMBIT_HEX]))
                elif etype == 6 and nn == 4:     # tet
                    cells.append((4, nodes))
                elif etype == 5 and nn == 6:     # wedge
                    cells.append((6, nodes))
                else:
                    raise ValueError(
                        f"gambitToFoam: element type {etype}/{nn} "
                        "unsupported")
        elif t.startswith("BOUNDARY CONDITIONS"):
            i += 1
            hdr = lines[i].split()
            name = hdr[0]
            gid = len(phys)
            phys[gid] = name
            nent = int(hdr[2])
            i += 1
            for _ in range(nent):
                parts = lines[i].split()
                ci, et, fi = int(parts[0]) - 1, int(parts[1]), \
                    int(parts[2]) - 1
                loc = _GAMBIT_FACES[et][fi]
                surfs.append((gid,
                              [cell_nodes[ci][p] for p in loc]))
                i += 1
        else:
            i += 1
    return np.asarray(pts), cells, surfs, phys


def read_vtk_unstructured(path: str):
    """vtkUnstructuredToFoam (reference: .../conversion/
    vtkUnstructuredToFoam/): legacy ASCII VTK UNSTRUCTURED_GRID."""
    toks: List[str] = []
    for ln in open(path):
        toks.extend(ln.split())
    up = [t.upper() for t in toks]
    i = up.index("POINTS")
    n = int(toks[i + 1])
    pts = np.asarray([float(x) for x in toks[i + 3:i + 3 + 3 * n]]
                     ).reshape(n, 3)
    i = up.index("CELLS")
    nc = int(toks[i + 1])
    total = int(toks[i + 2])
    body = [int(x) for x in toks[i + 3:i + 3 + total]]
    conn: List[List[int]] = []
    k = 0
    for _ in range(nc):
        cnt = body[k]
        conn.append(body[k + 1:k + 1 + cnt])
        k += 1 + cnt
    i = up.index("CELL_TYPES")
    types = [int(x) for x in toks[i + 2:i + 2 + nc]]
    cells = []
    for nodes, vt in zip(conn, types):
        if vt == 10:
            cells.append((4, nodes))
        elif vt == 12:
            cells.append((5, nodes))
        elif vt == 13:
            cells.append((6, [nodes[0], nodes[1], nodes[2],
                              nodes[3], nodes[4], nodes[5]]))
        elif vt == 14:
            cells.append((7, nodes))
        # surface cells (5=tri, 9=quad) are ignored: VTK files carry no
        # patch naming; boundary becomes defaultFaces
    return pts, cells, [], {}


# ---------------------------------------------------------------------------
# surface utilities (triangle soup [nT,3,3] from mesh/snappy read_stl)
# ---------------------------------------------------------------------------


def surface_merge_points(tris: np.ndarray, tol: float = 1e-10):
    """Unique points + triangle index list (surfacePointMerge)."""
    pts = tris.reshape(-1, 3)
    scale = max(float(np.abs(pts).max()), 1.0)
    upts, inv = np.unique(np.round(pts / (scale * tol)).astype(np.int64),
                          axis=0, return_inverse=True)
    # representative coordinates: first occurrence
    first = np.full(len(upts), -1, np.int64)
    for i, g in enumerate(inv):
        if first[g] < 0:
            first[g] = i
    return pts[first], inv.reshape(-1, 3)


def surface_clean(tris: np.ndarray, tol: float = 1e-10) -> np.ndarray:
    """Drop zero-area/degenerate triangles and exact duplicates
    (surfaceClean)."""
    pts, tri_idx = surface_merge_points(tris, tol)
    ok = (tri_idx[:, 0] != tri_idx[:, 1]) \
        & (tri_idx[:, 1] != tri_idx[:, 2]) \
        & (tri_idx[:, 0] != tri_idx[:, 2])
    tri_idx = tri_idx[ok]
    e1 = pts[tri_idx[:, 1]] - pts[tri_idx[:, 0]]
    e2 = pts[tri_idx[:, 2]] - pts[tri_idx[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    tri_idx = tri_idx[area > 1e-30]
    seen = set()
    keep = []
    for i, t in enumerate(tri_idx):
        key = tuple(sorted(int(x) for x in t))
        if key not in seen:
            seen.add(key)
            keep.append(i)
    tri_idx = tri_idx[keep]
    return pts[tri_idx]


def surface_orient(tris: np.ndarray, outside_pt) -> np.ndarray:
    """Flip triangles so normals point away from the interior as seen
    from outside_pt (surfaceOrient): uses the signed volume of the
    tetrahedron (tri, outside_pt) sum — for a closed surface the
    consistent orientation maximises the total signed volume."""
    p = np.asarray(outside_pt, float)
    # orient each triangle so its normal points from the surface toward
    # the side containing outside_pt locally
    c = tris.mean(axis=1)
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    flip = np.einsum("ij,ij->i", n, p[None, :] - c) < 0
    out = tris.copy()
    out[flip] = out[flip][:, ::-1, :]
    return out


def surface_inertia(tris: np.ndarray, rho: float = 1.0):
    """Volume, centroid and inertia tensor of a closed triangulated
    surface by divergence-theorem tet decomposition (surfaceInertia)."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    det = np.einsum("ij,ij->i", a, np.cross(b, c))
    vol = det.sum() / 6.0
    # tet-sum centroid: sum det*(a+b+c+0)/4 / (6 V)
    ctr = (det[:, None] * (a + b + c) / 4.0).sum(axis=0) / (6.0 * vol)
    # inertia by covariance of canonical tetrahedron
    cov = np.zeros((3, 3))
    for i in range(len(tris)):
        v = np.stack([a[i], b[i], c[i]])
        cpart = (v.T @ v + v.sum(0)[:, None] @ v.sum(0)[None, :])
        cov += det[i] / 120.0 * cpart
    m = rho * vol
    cov = rho * cov
    # shift to centroid
    cov -= m * ctr[:, None] @ ctr[None, :]
    inertia = np.eye(3) * np.trace(cov) - cov
    return vol, ctr, inertia


def split_stl_solids(path: str):
    """surfaceSplitByPatch: each `solid <name>` block of an ASCII STL
    becomes its own surface."""
    blocks: List[Tuple[str, List[str]]] = []
    cur = None
    for ln in open(path):
        s = ln.strip()
        if s.startswith("solid"):
            name = s[5:].strip() or f"patch{len(blocks)}"
            cur = (name, [ln])
            continue
        if cur is not None:
            cur[1].append(ln)
            if s.startswith("endsolid"):
                blocks.append(cur)
                cur = None
    return blocks


def triangulate_boundary(pm, patch_names=None) -> np.ndarray:
    """surfaceMeshTriangulate: fan-triangulate boundary faces of the
    volume mesh into an STL soup."""
    tris = []
    for p in pm.patches:
        if patch_names and p.name not in patch_names:
            continue
        if p.type == "empty":
            continue
        for f in range(p.start, p.start + p.size):
            k = pm.face_npts[f]
            ids = pm.face_pts[f, :k]
            for j in range(1, k - 1):
                tris.append(pm.points[[ids[0], ids[j], ids[j + 1]]])
    return np.asarray(tris) if tris else np.zeros((0, 3, 3))


# ---------------------------------------------------------------------------
# CLI commands
# ---------------------------------------------------------------------------


def _case_mesh_dir(case):
    return os.path.join(case, "constant", "polyMesh")


def _converter_cmd(reader, label, needs_base=False):
    def cmd(argv) -> int:
        import argparse as _ap

        ap = _ap.ArgumentParser(prog=label)
        ap.add_argument("infile")
        ap.add_argument("-case", default=".")
        a = ap.parse_args(argv)
        src = a.infile
        if needs_base and src.endswith((".node", ".ele", ".face")):
            src = os.path.splitext(src)[0]
        pm = to_polymesh(*reader(src))
        out = _case_mesh_dir(a.case)
        mesh_io.write(pm, out)
        print(f"{label}: {pm.n_cells} cells, {pm.n_faces} faces, "
              f"patches {[p.name for p in pm.patches]} -> {out}")
        return 0

    cmd.__doc__ = f"""{label} (reference: applications/utilities/mesh/
    conversion/{label}/)."""
    return cmd


tetgen_to_foam_cmd = _converter_cmd(read_tetgen, "tetgenToFoam",
                                    needs_base=True)
ideas_unv_to_foam_cmd = _converter_cmd(read_unv, "ideasUnvToFoam")
plot3d_to_foam_cmd = _converter_cmd(read_plot3d, "plot3dToFoam")
msh_to_foam_cmd = _converter_cmd(read_adventure_msh, "mshToFoam")
gambit_to_foam_cmd = _converter_cmd(read_gambit, "gambitToFoam")
vtk_unstructured_to_foam_cmd = _converter_cmd(
    read_vtk_unstructured, "vtkUnstructuredToFoam")


def surface_add_cmd(argv) -> int:
    """surfaceAdd <a> <b> <out>: concatenate two surfaces
    (reference: applications/utilities/surface/surfaceAdd/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("out")
    a = ap.parse_args(argv)
    tris = np.concatenate([read_stl(a.a), read_stl(a.b)], axis=0)
    write_stl(a.out, tris)
    print(f"surfaceAdd: {tris.shape[0]} triangles -> {a.out}")
    return 0


def surface_clean_cmd(argv) -> int:
    """surfaceClean <in> <out>: strip degenerate/duplicate triangles
    (reference: applications/utilities/surface/surfaceClean/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("out")
    ap.add_argument("-tol", type=float, default=1e-10)
    a = ap.parse_args(argv)
    tris = read_stl(a.infile)
    out = surface_clean(tris, a.tol)
    write_stl(a.out, out)
    print(f"surfaceClean: {tris.shape[0]} -> {out.shape[0]} triangles")
    return 0


def surface_point_merge_cmd(argv) -> int:
    """surfacePointMerge <in> <out> [-tol t]: merge coincident points
    (reference: applications/utilities/surface/surfacePointMerge/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("out")
    ap.add_argument("-tol", type=float, default=1e-10)
    a = ap.parse_args(argv)
    tris = read_stl(a.infile)
    pts, tri_idx = surface_merge_points(tris, a.tol)
    write_stl(a.out, pts[tri_idx])
    print(f"surfacePointMerge: {tris.reshape(-1, 3).shape[0]} -> "
          f"{pts.shape[0]} points")
    return 0


def surface_orient_cmd(argv) -> int:
    """surfaceOrient <in> '(x y z)' <out>: point normals toward the
    outside point (reference: .../surface/surfaceOrient/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("point")
    ap.add_argument("out")
    a = ap.parse_args(argv)
    p = [float(x) for x in a.point.strip("()").split()]
    tris = surface_orient(read_stl(a.infile), p)
    write_stl(a.out, tris)
    print(f"surfaceOrient: {tris.shape[0]} triangles oriented toward "
          f"{p}")
    return 0


def surface_inertia_cmd(argv) -> int:
    """surfaceInertia <in> [-density rho]: volume/centroid/inertia of a
    closed surface (reference: .../surface/surfaceInertia/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("-density", type=float, default=1.0)
    a = ap.parse_args(argv)
    vol, ctr, inertia = surface_inertia(read_stl(a.infile), a.density)
    print(f"Volume  : {vol:g}")
    print(f"Mass    : {vol * a.density:g}")
    print(f"Centroid: ({ctr[0]:g} {ctr[1]:g} {ctr[2]:g})")
    print("Inertia tensor (about centroid):")
    for r in inertia:
        print(f"  ({r[0]:g} {r[1]:g} {r[2]:g})")
    return 0


def surface_split_by_patch_cmd(argv) -> int:
    """surfaceSplitByPatch <in.stl>: write each `solid` block to its
    own file (reference: .../surface/surfaceSplitByPatch/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("infile")
    a = ap.parse_args(argv)
    blocks = split_stl_solids(a.infile)
    base = os.path.splitext(a.infile)[0]
    for name, lines in blocks:
        out = f"{base}_{name}.stl"
        with open(out, "w") as f:
            f.writelines(lines)
        print(f"  {name}: {out}")
    print(f"surfaceSplitByPatch: {len(blocks)} patches")
    return 0


def surface_mesh_triangulate_cmd(argv) -> int:
    """surfaceMeshTriangulate <out.stl> [-patches '(a b)']: extract the
    boundary of the volume mesh as a triangulated surface
    (reference: .../surface/surfaceMeshTriangulate/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("-case", default=".")
    ap.add_argument("-patches", default=None)
    a = ap.parse_args(argv)
    pm = mesh_io.read(_case_mesh_dir(a.case))
    names = None
    if a.patches:
        names = set(a.patches.strip("()").split())
    tris = triangulate_boundary(pm, names)
    write_stl(a.out, tris)
    print(f"surfaceMeshTriangulate: {tris.shape[0]} triangles -> "
          f"{a.out}")
    return 0


def inside_cells_cmd(argv) -> int:
    """insideCells <surface> <cellSet>: cells whose centres lie inside
    the closed surface (reference: .../mesh/manipulation/insideCells/;
    inside test = generalized winding number, mesh/snappy.py)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("surface")
    ap.add_argument("set_name")
    ap.add_argument("-case", default=".")
    ap.add_argument("-outside", action="store_true")
    a = ap.parse_args(argv)
    from ..mesh.snappy import points_inside
    from .meshutils import write_set

    pm = mesh_io.read(_case_mesh_dir(a.case))
    tris = read_stl(a.surface)
    mask = points_inside(tris, np.asarray(pm.c))
    if a.outside:
        mask = ~mask
    ids = np.nonzero(mask)[0]
    write_set(a.case, a.set_name, "cellSet", ids)
    print(f"insideCells: {ids.size} cells -> sets/{a.set_name}")
    return 0


def select_cells_cmd(argv) -> int:
    """selectCells: cellSet from system/selectCellsDict (surface +
    outsidePoints; reference: .../mesh/manipulation/selectCells/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)
    from ..mesh.snappy import points_inside
    from .meshutils import write_set

    d = parse_file(os.path.join(a.case, "system", "selectCellsDict"))
    surf = str(d.get("surface", ""))
    pm = mesh_io.read(_case_mesh_dir(a.case))
    tris = read_stl(os.path.join(a.case, surf) if not
                    os.path.isabs(surf) else surf)
    mask = points_inside(tris, np.asarray(pm.c))
    # outsidePoints select the complement region
    op = d.get("outsidePoints")
    if op is not None:
        pts = np.asarray(op, float).reshape(-1, 3)
        if points_inside(tris, pts).any():
            mask = ~mask
    ids = np.nonzero(mask)[0]
    write_set(a.case, "selected", "cellSet", ids)
    print(f"selectCells: {ids.size} cells -> sets/selected")
    return 0


def split_mesh_cmd(argv) -> int:
    """splitMesh <faceSet> <masterPatch> <slavePatch>: detach the mesh
    along a faceSet into twin boundary patches (reference:
    .../mesh/manipulation/splitMesh/; same surgery as createBaffles)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("set_name")
    ap.add_argument("master")
    ap.add_argument("slave")
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)
    from . import meshutils, meshutils3

    mdir = _case_mesh_dir(a.case)
    pm = mesh_io.read(mdir)
    ids = meshutils.read_set(a.case, a.set_name)
    out = meshutils3.create_baffles(pm, ids, a.master)
    # rename the twin halves master/slave (create_baffles emits
    # <name> and <name>_slave)
    import dataclasses as _dc

    pats = [(_dc.replace(p, name=a.slave)
             if p.name == a.master + "_slave" else p)
            for p in out.patches]
    out.patches[:] = pats
    mesh_io.write(out, mdir)
    print(f"splitMesh: {ids.size} faces -> patches "
          f"{a.master}/{a.slave}")
    return 0


def expand_dictionary_cmd(argv) -> int:
    """expandDictionary <file>: parse (resolving #include/$macros) and
    print (reference: .../miscellaneous/expandDictionary/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("file")
    a = ap.parse_args(argv)
    d = parse_file(a.file)

    def dump(dd, indent=0):
        pad = "    " * indent
        for k, v in dd.items():
            if isinstance(v, FoamDict):
                print(f"{pad}{k}")
                print(pad + "{")
                dump(v, indent + 1)
                print(pad + "}")
            else:
                print(f"{pad}{k} {_fmt_entry(v)};")

    dump(d)
    return 0


def _fmt_entry(v):
    if isinstance(v, np.ndarray):
        flat = np.asarray(v)
        if flat.ndim == 1:
            return "(" + " ".join(f"{x:g}" for x in flat) + ")"
        return "(" + " ".join(
            "(" + " ".join(f"{x:g}" for x in row) + ")"
            for row in flat) + ")"
    if isinstance(v, (list, tuple)):
        return " ".join(str(_fmt_entry(x)) for x in v)
    return v


def foam_info_exec_cmd(argv) -> int:
    """foamInfoExec -dictionary <file> [-entry a.b.c]: print an entry
    (reference: .../miscellaneous/foamInfoExec/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("-dictionary", required=True)
    ap.add_argument("-entry", default=None)
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)
    path = a.dictionary if os.path.exists(a.dictionary) else \
        os.path.join(a.case, a.dictionary)
    d = parse_file(path)
    if a.entry:
        cur = d
        for part in a.entry.replace("/", ".").split("."):
            cur = cur[part] if isinstance(cur, FoamDict) else cur
        print(_fmt_entry(cur) if not isinstance(cur, FoamDict)
              else dict(cur.items()))
    else:
        print(dict(d.items()))
    return 0


def patch_summary_cmd(argv) -> int:
    """patchSummary: per-patch BC type of every field at the latest
    time (reference: .../miscellaneous/patchSummary/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("-case", default=".")
    ap.add_argument("-time", default=None)
    a = ap.parse_args(argv)
    pm = mesh_io.read(_case_mesh_dir(a.case))
    times = []
    for d in glob.glob(os.path.join(a.case, "*")):
        b = os.path.basename(d)
        try:
            times.append((float(b), d))
        except ValueError:
            pass
    if not times:
        print("patchSummary: no time directories")
        return 1
    tdir = dict((f"{t:g}", d) for t, d in times).get(a.time) \
        if a.time else sorted(times)[-1][1]
    fields = {}
    for f in sorted(glob.glob(os.path.join(tdir, "*"))):
        if not os.path.isfile(f):
            continue
        try:
            d = parse_file(f)
        except Exception:
            continue
        bf = d.get("boundaryField")
        if bf is None:
            continue
        fields[os.path.basename(f)] = bf
    for p in pm.patches:
        print(f"patch {p.name} ({p.type}, {p.size} faces):")
        for name, bf in fields.items():
            spec = bf.get(p.name)
            if spec is None:
                for k, v in bf.items():
                    if k.startswith('"') and isinstance(v, FoamDict):
                        import re
                        if re.fullmatch(k.strip('"'), p.name):
                            spec = v
                            break
            t = str(spec.get("type")) if isinstance(spec, FoamDict) \
                else "-"
            print(f"    {name:12s} {t}")
    return 0


def steady_particle_tracks_cmd(argv) -> int:
    """steadyParticleTracks: join per-time lagrangian positions into
    VTK polylines by origId (reference: .../postProcessing/lagrangian/
    steadyParticleTracks/)."""
    from . import cli as _cli

    # the transient particleTracks command implements the same join;
    # steady tracks are the same data with one time per position dump
    return _cli.COMMANDS["particleTracks"](argv)


def engine_swirl_cmd(argv) -> int:
    """engineSwirl: initialise a solid-body swirl velocity about the
    cylinder axis (reference: .../preProcessing/engineSwirl/ — the
    Bessel-profile generator is simplified to solid-body rotation at
    the target swirl RPM; documented deviation)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)

    eg = parse_file(os.path.join(a.case, "constant", "engineGeometry"))
    rpm = float(np.asarray(eg.get("engineRPM", 1000.0),
                           float).reshape(-1)[-1])
    swirl = float(np.asarray(eg.get("swirlRatio",
                                    eg.get("swirl", 1.0)),
                             float).reshape(-1)[-1])
    omega = swirl * rpm * 2.0 * np.pi / 60.0
    import jax.numpy as jnp

    from ..io import fields as field_io
    from ..mesh import to_device

    mesh = to_device(mesh_io.read(_case_mesh_dir(a.case)))
    c = np.asarray(mesh.c)
    axis = np.asarray([0.0, 0.0, 1.0])
    u = np.cross(omega * axis, c - c.mean(axis=0) * [1, 1, 0])
    U = field_io.read_field(os.path.join(a.case, "0", "U"), mesh)
    field_io.write_field(U.with_data(jnp.asarray(u, mesh.v.dtype)),
                         mesh, a.case, "0")
    print(f"engineSwirl: omega={omega:g} rad/s written to 0/U")
    return 0


def foam_upgrade_fv_solution_cmd(argv) -> int:
    """foamUpgradeFvSolution: rewrite pre-1.7 `solvers { p PCG {..}; }`
    one-line solver entries to the sub-dictionary form (reference:
    .../miscellaneous/foamUpgradeFvSolution/)."""
    import argparse as _ap
    import re

    ap = _ap.ArgumentParser()
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)
    path = os.path.join(a.case, "system", "fvSolution")
    text = open(path).read()
    # p PCG { ... }  ->  p { solver PCG; ... }
    pat = re.compile(r"^(\s*)(\w+)\s+(PCG|PBiCG|PBiCGStab|GAMG|"
                     r"smoothSolver|diagonal)\s*\{", re.M)
    out, n = pat.subn(r"\1\2\n\1{\n\1    solver \3;", text)
    if n:
        open(path, "w").write(out)
    print(f"foamUpgradeFvSolution: {n} solver entr"
          f"{'y' if n == 1 else 'ies'} upgraded")
    return 0


def dsmc_initialise_cmd(argv) -> int:
    """dsmcInitialise: seed the DSMC cloud from
    system/dsmcInitialiseDict and report the parcel fill (reference:
    .../preProcessing/dsmcInitialise/; the solver start-up performs
    the same fill when no cloud exists — this utility validates the
    dictionaries up front)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)
    import jax.numpy as jnp

    from ..lagrangian import dsmc
    from ..mesh import to_device

    props = parse_file(os.path.join(a.case, "constant",
                                    "dsmcProperties"))
    init = parse_file(os.path.join(a.case, "system",
                                   "dsmcInitialiseDict"))
    pm = mesh_io.read(_case_mesh_dir(a.case))
    mesh = to_device(pm)
    fn = float(np.asarray(props.get("nEquivalentParticles", 1e12),
                          float).reshape(-1)[-1])
    mol = props.get("moleculeProperties", FoamDict())
    names, mass, dref, omega = [], [], [], []
    for k, v in mol.items():
        if isinstance(v, FoamDict):
            names.append(k)
            mass.append(float(np.asarray(v.get("mass", 6.63e-26),
                                         float).reshape(-1)[-1]))
            dref.append(float(np.asarray(v.get("diameter", 4.17e-10),
                                         float).reshape(-1)[-1]))
            omega.append(float(np.asarray(v.get("omega", 0.81),
                                          float).reshape(-1)[-1]))
    species = dsmc.Species(
        mass=jnp.asarray(mass), d_ref=jnp.asarray(dref),
        omega=jnp.asarray(omega))
    nd = init.get("numberDensities", FoamDict())
    ndens = sum(float(np.asarray(v, float).reshape(-1)[-1])
                for v in nd.values()) or 1e20
    T = float(np.asarray(init.get("temperature", 300.0),
                         float).reshape(-1)[-1])
    U0 = np.asarray(init.get("velocity", (0.0, 0.0, 0.0)),
                    float).reshape(-1)[-3:]
    cloud = dsmc.initialise(mesh, species, ndens, T, tuple(U0), fn)
    print(f"dsmcInitialise: {int(cloud.n_active)} parcels "
          f"({len(names)} species, fn={fn:g})")
    return 0


def md_initialise_cmd(argv) -> int:
    """mdInitialise: lattice-fill molecules into the case bounding box
    (reference: .../preProcessing/mdInitialise/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("-case", default=".")
    ap.add_argument("-n", type=int, default=5)
    a = ap.parse_args(argv)
    from ..lagrangian import md

    pm = mesh_io.read(_case_mesh_dir(a.case))
    lo = np.asarray(pm.points).min(axis=0)
    hi = np.asarray(pm.points).max(axis=0)
    idict = {}
    p = os.path.join(a.case, "system", "mdInitialiseDict")
    if os.path.exists(p):
        idict = parse_file(p)
    T0 = float(np.asarray(idict.get("temperature", 300.0),
                          float).reshape(-1)[-1]) if idict else 300.0
    x, u = md.lattice_fill(hi - lo, a.n, 6.63e-26, T0)
    x = x + lo
    print(f"mdInitialise: {x.shape[0]} molecules in "
          f"[{lo.round(4)}..{hi.round(4)}] at T={T0:g} K")
    return 0


COMMANDS = {
    "tetgenToFoam": tetgen_to_foam_cmd,
    "ideasUnvToFoam": ideas_unv_to_foam_cmd,
    "plot3dToFoam": plot3d_to_foam_cmd,
    "mshToFoam": msh_to_foam_cmd,
    "gambitToFoam": gambit_to_foam_cmd,
    "vtkUnstructuredToFoam": vtk_unstructured_to_foam_cmd,
    "surfaceAdd": surface_add_cmd,
    "surfaceClean": surface_clean_cmd,
    "surfacePointMerge": surface_point_merge_cmd,
    "surfaceOrient": surface_orient_cmd,
    "surfaceInertia": surface_inertia_cmd,
    "surfaceSplitByPatch": surface_split_by_patch_cmd,
    "surfaceMeshTriangulate": surface_mesh_triangulate_cmd,
    "insideCells": inside_cells_cmd,
    "selectCells": select_cells_cmd,
    "splitMesh": split_mesh_cmd,
    "expandDictionary": expand_dictionary_cmd,
    "foamInfoExec": foam_info_exec_cmd,
    "patchSummary": patch_summary_cmd,
    "steadyParticleTracks": steady_particle_tracks_cmd,
    "engineSwirl": engine_swirl_cmd,
    "foamUpgradeFvSolution": foam_upgrade_fv_solution_cmd,
    "dsmcInitialise": dsmc_initialise_cmd,
    "mdInitialise": md_initialise_cmd,
}
