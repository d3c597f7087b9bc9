"""GAMG: geometric-algebraic multigrid, TPU-native.

Rebuild of reference: src/OpenFOAM/matrices/lduMatrix/solvers/GAMG/
(GAMGSolver, GAMGAgglomeration, pairGAMGAgglomeration). Design mapping
(SURVEY.md §7 hard-part #2):

- The pairwise agglomeration hierarchy is computed ONCE on the host
  (NumPy) from the mesh face weights (faceAreaPair: max face area —
  reference: faceAreaPairGAMGAgglomeration). Every level has a STATIC
  size, so the whole V-cycle unrolls into one XLA program.
- Galerkin coarsening of the (diag, upper, lower) coefficients happens
  on device each solve, but through precomputed padded GATHER tables
  (coarse face <- fine faces, coarse cell <- fine cells/intra faces):
  no scatters anywhere.
- Smoother: damped Jacobi (symmetric, parallel) instead of the
  reference's sequential Gauss-Seidel/DIC — convergence-parity risk
  documented; mitigated by wrapping the V-cycle as a preconditioner in
  CG (one V-cycle per CG iteration), which is strictly more robust
  than the reference's plain multigrid iteration.
- Coarsest level: dense solve (jnp.linalg.solve) on <= ~64 cells —
  replicated, not sharded, exactly the SURVEY §2b recipe.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.precision import label_np, scalar_np
from .krylov import SolverPerf, _norm_factor, _small

# ---------------------------------------------------------------------------
# Host-side hierarchy construction
# ---------------------------------------------------------------------------


def _pair_agglomerate(owner, neighbour, weights, n_cells):
    """One pairwise agglomeration sweep (reference:
    pairGAMGAgglomeration::agglomerate): merge each cell with its
    strongest-weighted unmatched neighbour."""
    # adjacency lists via sorting
    nIf = owner.shape[0]
    cell_to_coarse = np.full(n_cells, -1, dtype=np.int64)
    # build per-cell neighbor/weight lists
    ends = np.concatenate([owner, neighbour])
    others = np.concatenate([neighbour, owner])
    w2 = np.concatenate([weights, weights])
    order = np.argsort(ends, kind="stable")
    ends_s, others_s, w_s = ends[order], others[order], w2[order]
    starts = np.searchsorted(ends_s, np.arange(n_cells + 1))

    n_coarse = 0
    for c in range(n_cells):
        if cell_to_coarse[c] >= 0:
            continue
        sl = slice(starts[c], starts[c + 1])
        nbrs = others_s[sl]
        ws = w_s[sl]
        # strongest unmatched neighbour
        best = -1
        best_w = -1.0
        best_matched = -1
        best_matched_w = -1.0
        for nb, wv in zip(nbrs, ws):
            if cell_to_coarse[nb] < 0:
                if wv > best_w:
                    best, best_w = nb, wv
            else:
                if wv > best_matched_w:
                    best_matched, best_matched_w = nb, wv
        if best >= 0:
            cell_to_coarse[c] = n_coarse
            cell_to_coarse[best] = n_coarse
            n_coarse += 1
        elif best_matched >= 0:
            cell_to_coarse[c] = cell_to_coarse[best_matched]
        else:
            cell_to_coarse[c] = n_coarse
            n_coarse += 1
    return cell_to_coarse, n_coarse


def _pad_groups(group_of, n_groups, payload=None):
    """[n] group ids -> padded member table [n_groups, M] + mask.
    payload defaults to the element index."""
    n = group_of.shape[0]
    order = np.argsort(group_of, kind="stable")
    sorted_g = group_of[order]
    counts = np.bincount(sorted_g, minlength=n_groups)
    M = max(int(counts.max()) if n else 1, 1)
    starts = np.zeros(n_groups, dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    rank = np.arange(n) - starts[sorted_g]
    table = np.zeros((n_groups, M), dtype=np.int64)
    mask = np.zeros((n_groups, M))
    vals = order if payload is None else payload[order]
    table[sorted_g, rank] = vals
    mask[sorted_g, rank] = 1.0
    return table, mask


def _cell_tables_internal(owner, neighbour, n_cells):
    """Gather tables for an internal-faces-only LDU level (same layout
    as PolyMesh.cell_tables but no boundary)."""
    nIf = owner.shape[0]
    counts = np.bincount(owner, minlength=n_cells) + np.bincount(
        neighbour, minlength=n_cells
    )
    K = max(int(counts.max()) if nIf else 1, 1)
    cface = np.zeros((n_cells, K), dtype=np.int64)
    csign = np.zeros((n_cells, K))
    cnbr = np.zeros((n_cells, K), dtype=np.int64)
    valid = np.zeros((n_cells, K))

    def slots(cells, offset):
        order = np.argsort(cells, kind="stable")
        cnts = np.bincount(cells, minlength=n_cells)
        starts = np.zeros(n_cells, dtype=np.int64)
        starts[1:] = np.cumsum(cnts)[:-1]
        rank = np.empty_like(order)
        rank[order] = np.arange(cells.shape[0]) - starts[cells[order]]
        return rank + offset[cells]

    zero_off = np.zeros(n_cells, dtype=np.int64)
    own_counts = np.bincount(owner, minlength=n_cells)
    k_o = slots(owner, zero_off)
    faces = np.arange(nIf)
    cface[owner, k_o] = faces
    csign[owner, k_o] = 1.0
    cnbr[owner, k_o] = neighbour
    valid[owner, k_o] = 1.0
    k_n = slots(neighbour, own_counts)
    cface[neighbour, k_n] = faces
    csign[neighbour, k_n] = -1.0
    cnbr[neighbour, k_n] = owner
    valid[neighbour, k_n] = 1.0
    return dict(cface=cface, csign=csign, cnbr=cnbr, valid=valid)


@dataclasses.dataclass(frozen=True)
class Level:
    """Static per-level tables (device arrays; sizes are static)."""

    n_coarse: int
    # restriction / prolongation
    restrict: Any        # [nC_fine] coarse id of each fine cell
    members: Any         # [nCc, M] fine cells per coarse cell
    members_mask: Any
    # face coarsening
    face_src: Any        # [nFc, Mf] fine faces per coarse face
    face_src_mask: Any
    face_src_flip: Any   # 1.0 where fine orientation is flipped
    intra_faces: Any     # [nCc, Mi] fine faces internal to the cluster
    intra_mask: Any
    # coarse-level SpMV tables
    cface: Any           # [nCc, Kc]
    csign: Any
    cnbr: Any
    valid: Any


def build_hierarchy(
    owner: np.ndarray,
    neighbour: np.ndarray,
    weights: np.ndarray,
    n_cells: int,
    n_coarsest: int = 32,
    max_levels: int = 20,
) -> List[Level]:
    """Full agglomeration hierarchy from the fine-level internal-face
    addressing + face weights (magSf for faceAreaPair)."""
    owner = np.asarray(owner[: neighbour.shape[0]], dtype=np.int64)
    neighbour = np.asarray(neighbour, dtype=np.int64)
    weights = np.asarray(weights[: neighbour.shape[0]], dtype=np.float64)
    levels: List[Level] = []
    nC = n_cells

    for _ in range(max_levels):
        if nC <= n_coarsest or owner.shape[0] == 0:
            break
        restrict, nCc = _pair_agglomerate(owner, neighbour, weights, nC)
        if nCc >= nC:  # no progress
            break
        co = restrict[owner]
        cn = restrict[neighbour]
        flip = co > cn
        lo = np.where(flip, cn, co)
        hi = np.where(flip, co, cn)
        intra = lo == hi
        inter_idx = np.nonzero(~intra)[0]
        intra_idx = np.nonzero(intra)[0]

        pairs = np.stack([lo[inter_idx], hi[inter_idx]], axis=1)
        uniq, face_of = np.unique(pairs, axis=0, return_inverse=True)
        # sort coarse faces upper-triangular
        forder = np.lexsort((uniq[:, 1], uniq[:, 0]))
        remap = np.empty(forder.shape[0], dtype=np.int64)
        remap[forder] = np.arange(forder.shape[0])
        face_of = remap[face_of]
        c_own = uniq[forder, 0]
        c_nei = uniq[forder, 1]
        nFc = c_own.shape[0]

        face_src, face_mask = _pad_groups(face_of, nFc, payload=inter_idx)
        # flip flags aligned with face_src payload
        flip_src, _ = _pad_groups(face_of, nFc,
                                  payload=flip[inter_idx].astype(np.int64))
        intra_cell = lo[intra_idx]
        if intra_idx.shape[0]:
            intra_tab, intra_mask = _pad_groups(intra_cell, nCc, payload=intra_idx)
        else:
            intra_tab = np.zeros((nCc, 1), dtype=np.int64)
            intra_mask = np.zeros((nCc, 1))
        members, members_mask = _pad_groups(restrict, nCc)
        tabs = _cell_tables_internal(c_own, c_nei, nCc)

        sdt = scalar_np()
        lv = Level(
            n_coarse=nCc,
            restrict=jnp.asarray(restrict, label_np),
            members=jnp.asarray(members, label_np),
            members_mask=jnp.asarray(members_mask, sdt),
            face_src=jnp.asarray(face_src, label_np),
            face_src_mask=jnp.asarray(face_mask, sdt),
            face_src_flip=jnp.asarray(flip_src, sdt),
            intra_faces=jnp.asarray(intra_tab, label_np),
            intra_mask=jnp.asarray(intra_mask, sdt),
            cface=jnp.asarray(tabs["cface"], label_np),
            csign=jnp.asarray(tabs["csign"], sdt),
            cnbr=jnp.asarray(tabs["cnbr"], label_np),
            valid=jnp.asarray(tabs["valid"], sdt),
        )
        levels.append(lv)

        # coarse-level weights: sum of fine weights per coarse face
        new_w = np.zeros(nFc)
        np.add.at(new_w, face_of, weights[inter_idx])
        owner, neighbour, weights, nC = c_own, c_nei, new_w, nCc

    return levels


def hierarchy_for_mesh(mesh) -> List[Level]:
    nif = mesh.n_internal_faces
    return build_hierarchy(
        np.asarray(mesh.owner)[:nif],
        np.asarray(mesh.neighbour),
        np.asarray(mesh.mag_sf)[:nif],
        mesh.n_cells,
    )


# ---------------------------------------------------------------------------
# Device-side solve
# ---------------------------------------------------------------------------


def _coarsen_matrix(lv: Level, diag, upper, lower):
    """Galerkin coarse coefficients via gather tables."""
    up_g = upper[lv.face_src]
    lo_g = lower[lv.face_src]
    flip = lv.face_src_flip
    m = lv.face_src_mask
    c_upper = jnp.sum(jnp.where(flip > 0, lo_g, up_g) * m, axis=1)
    c_lower = jnp.sum(jnp.where(flip > 0, up_g, lo_g) * m, axis=1)
    d_members = jnp.sum(diag[lv.members] * lv.members_mask, axis=1)
    d_intra = jnp.sum(
        (upper[lv.intra_faces] + lower[lv.intra_faces]) * lv.intra_mask, axis=1
    )
    c_diag = d_members + d_intra
    return c_diag, c_upper, c_lower


def _level_amul(lv_tabs, diag, upper, lower, x):
    cface, csign, cnbr, valid = lv_tabs
    off = jnp.where(csign > 0, upper[cface], lower[cface]) * valid
    return diag * x + jnp.sum(off * x[cnbr], axis=1)


def _restrict(lv: Level, r):
    return jnp.sum(r[lv.members] * lv.members_mask, axis=1)


def _prolong(lv: Level, xc):
    return xc[lv.restrict]


def _dense_solve(owner_tabs, diag, upper, lower, b, cface, csign, cnbr, valid):
    """Coarsest-level direct solve: scatter LDU into dense [n,n]."""
    n = diag.shape[0]
    A = jnp.zeros((n, n), diag.dtype)
    A = A + jnp.diag(diag)
    # rows: cell c, columns cnbr; off coeff per slot
    off = jnp.where(csign > 0, upper[cface], lower[cface]) * valid
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], cnbr.shape)
    A = A.at[rows, cnbr].add(off)
    return jnp.linalg.solve(A, b)


class GAMG:
    """Multigrid preconditioner/solver bound to one mesh hierarchy."""

    def __init__(self, mesh, levels: Optional[List[Level]] = None,
                 n_pre: int = 2, n_post: int = 2, omega: float = 0.8):
        self.levels = levels if levels is not None else hierarchy_for_mesh(mesh)
        self.mesh = mesh
        self.n_pre = n_pre
        self.n_post = n_post
        self.omega = omega

    # fine-level tables come from the FvMesh
    def _fine_tabs(self, mesh):
        return (mesh.cface_i, mesh.csign, mesh.cnbr, mesh.cnbr_valid)

    def _tabs(self, i, mesh):
        if i == 0:
            return self._fine_tabs(mesh)
        lv = self.levels[i - 1]
        return (lv.cface, lv.csign, lv.cnbr, lv.valid)

    def vcycle(self, mesh, mats, b, x):
        """One V-cycle. mats: list of (diag, upper, lower) per level
        (0 = finest). Returns improved x."""
        levels = self.levels
        n_levels = len(mats)

        def smooth(i, diag, upper, lower, x, b, n):
            tabs = self._tabs(i, mesh)
            rd = self.omega / diag
            for _ in range(n):
                x = x + (b - _level_amul(tabs, diag, upper, lower, x)) * rd
            return x

        bs = [b]
        xs = [x]
        # descend
        for i in range(n_levels - 1):
            diag, upper, lower = mats[i]
            xi = smooth(i, diag, upper, lower, xs[i], bs[i], self.n_pre)
            xs[i] = xi
            r = bs[i] - _level_amul(self._tabs(i, mesh), diag, upper, lower, xi)
            bs.append(_restrict(levels[i], r))
            xs.append(jnp.zeros(levels[i].n_coarse, x.dtype))
        # coarsest
        diag, upper, lower = mats[-1]
        if n_levels == 1:
            xs[0] = smooth(0, diag, upper, lower, xs[0], bs[0], 8)
        else:
            lv = levels[n_levels - 2]
            xs[-1] = _dense_solve(
                None, diag, upper, lower, bs[-1],
                lv.cface, lv.csign, lv.cnbr, lv.valid,
            )
        # ascend
        for i in range(n_levels - 2, -1, -1):
            diag, upper, lower = mats[i]
            xi = xs[i] + _prolong(levels[i], xs[i + 1])
            xs[i] = smooth(i, diag, upper, lower, xi, bs[i], self.n_post)
        return xs[0]

    def coarsen_all(self, diag_eff, upper, lower):
        mats = [(diag_eff, upper, lower)]
        d, u, l = diag_eff, upper, lower
        for lv in self.levels:
            d, u, l = _coarsen_matrix(lv, d, u, l)
            mats.append((d, u, l))
        return mats

    def solve(self, mesh, mat, psi, controls) -> Tuple[Any, SolverPerf]:
        """GAMG-preconditioned CG (symmetric) / BiCGStab (asymmetric)."""
        tol = float(controls.get("tolerance", 1e-6))
        rel_tol = float(controls.get("relTol", 0.0))
        max_iter = int(controls.get("maxIter", 200))

        def solve_one(psi1, d_eff, b):
            mats = self.coarsen_all(d_eff, mat.lower, mat.upper)
            tabs = self._fine_tabs(mesh)

            def amul(x):
                return _level_amul(tabs, d_eff, mat.upper, mat.lower, x)

            def prec(r):
                return self.vcycle(mesh, mats, r, jnp.zeros_like(r))

            from .krylov import SolverPerf as SP

            Apsi = amul(psi1)
            row_sum = d_eff + jnp.sum(
                jnp.where(mesh.csign > 0, mat.upper[mesh.cface_i],
                          mat.lower[mesh.cface_i]) * mesh.cnbr_valid, axis=1
            )
            pA = row_sum * jnp.mean(psi1)
            norm = (jnp.sum(jnp.abs(Apsi - pA)) + jnp.sum(jnp.abs(b - pA))
                    + _small(psi1.dtype))
            r0 = b - Apsi
            res0 = jnp.sum(jnp.abs(r0)) / norm
            tiny = jnp.asarray(_small(psi1.dtype), psi1.dtype)

            def cond(s):
                x, r, p, wArA, it, res = s
                return (it < max_iter) & (res > tol) & (res > rel_tol * res0)

            def body(s):
                x, r, p, wArA_old, it, res = s
                z = prec(r)
                wArA = jnp.vdot(r, z)
                beta = jnp.where(
                    it == 0, 0.0,
                    wArA / jnp.where(wArA_old == 0, tiny, wArA_old))
                p = z + beta * p
                q = amul(p)
                pq = jnp.vdot(p, q)
                alpha = wArA / jnp.where(pq == 0, tiny, pq)
                x = x + alpha * p
                r = r - alpha * q
                res = jnp.sum(jnp.abs(r)) / norm
                return x, r, p, wArA, it + 1, res

            init = (psi1, r0, jnp.zeros_like(psi1),
                    jnp.zeros((), psi1.dtype), jnp.zeros((), jnp.int32), res0)
            x, r, p, wArA, it, res = jax.lax.while_loop(cond, body, init)
            return x, SP(res0, res, it)

        if psi.ndim == 1:
            return solve_one(psi, mat.diag_eff(mesh), mat.source_eff(mesh))
        cols, perf0 = [], None
        for c in range(psi.shape[1]):
            col, perf = solve_one(
                psi[:, c], mat.diag_eff(mesh, c), mat.source_eff(mesh, c)
            )
            cols.append(col)
            perf0 = perf0 or perf
        return jnp.stack(cols, axis=1), perf0


def solve_gamg(mesh, mat, psi, controls) -> Tuple[Any, SolverPerf]:
    g = controls.get("_gamg")
    if g is None:
        raise ValueError(
            "GAMG solver needs a prebuilt hierarchy: pass controls['_gamg'] "
            "= GAMG(mesh) (built once per mesh at case load)"
        )
    return g.solve(mesh, mat, psi, controls)
