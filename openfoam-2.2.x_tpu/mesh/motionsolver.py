"""fvMotionSolver — Laplacian point-displacement mesh motion.

Rebuild of reference: src/fvMotionSolver/fvMotionSolvers/
displacementLaplacian/ (+ volPointInterpolation): solve

    laplacian(diffusivity, cellDisplacement) = 0

with the prescribed boundary displacement as fixedValue BCs, then
interpolate cell displacement to the points (inverse-distance
volPointInterpolation) with the boundary points pinned to their
prescribed motion, and rebuild the geometry (mesh/moving.py).

Diffusivity: uniform or inverseDistance (1/d^2 from the moving
patches — the reference's quadratic inverseDistance), which stiffens
the near-boundary region so cells next to the moving wall deform
least.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..bc import patchfields as pf
from ..core.dimensions import dimless
from ..core.fields import VolField
from ..ops import fvm
from ..solvers import linear


class DisplacementLaplacian:
    """Host-prepared motion solver bound to one mesh topology."""

    def __init__(self, pm, mesh, moving_patches: Iterable[str],
                 diffusivity: str = "inverseDistance"):
        self.pm = pm
        self.mesh = mesh
        self.moving = tuple(moving_patches)
        # point <- cell inverse-distance weights + boundary point sets
        nP = pm.n_points
        pt_cells = [[] for _ in range(nP)]
        for f in range(pm.n_faces):
            k = pm.face_npts[f]
            for pt in pm.face_pts[f, :k]:
                pt_cells[pt].append(pm.owner[f])
                if f < pm.n_internal_faces:
                    pt_cells[pt].append(pm.neighbour[f])
        rows, cols, wts = [], [], []
        for p_, cl in enumerate(pt_cells):
            cl = list(set(int(x) for x in cl))
            d = np.linalg.norm(pm.c[cl] - pm.points[p_], axis=1)
            w = 1.0 / np.maximum(d, 1e-12)
            w /= w.sum()
            rows += [p_] * len(cl)
            cols += cl
            wts += list(w)
        self._rows = jnp.asarray(np.asarray(rows, np.int32))
        self._cols = jnp.asarray(np.asarray(cols, np.int32))
        self._wts = jnp.asarray(np.asarray(wts), mesh.v.dtype)

        # boundary points per patch (moving pinned to the prescribed
        # motion; other boundary points pinned to zero displacement)
        mov_pts, fix_pts = set(), set()
        for p_ in pm.patches:
            if p_.type == "empty":
                continue
            tgt = mov_pts if p_.name in self.moving else fix_pts
            for f in range(p_.start, p_.start + p_.size):
                k = pm.face_npts[f]
                for pt in pm.face_pts[f, :k]:
                    tgt.add(int(pt))
        fix_pts -= mov_pts
        self._mov_pts = jnp.asarray(sorted(mov_pts), jnp.int32)
        self._fix_pts = jnp.asarray(sorted(fix_pts), jnp.int32)

        # diffusivity (face field): inverseDistance^2 from moving patches
        if diffusivity == "inverseDistance" and mov_pts:
            mp = pm.points[sorted(mov_pts)]
            from scipy.spatial import cKDTree

            tree = cKDTree(mp)
            d_f = tree.query(pm.cf)[0]
            gamma = 1.0 / np.maximum(d_f, 1e-6) ** 2
        else:
            gamma = np.ones(pm.n_faces)
        self._gamma = jnp.asarray(gamma, mesh.v.dtype)

        # BC template for the cell-displacement solve
        bcs = []
        for p_ in mesh.patches:
            if p_.type == "empty":
                bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            elif p_.name in self.moving:
                bcs.append(pf.fixed_value(jnp.zeros(3)))
            else:
                bcs.append(pf.fixed_value(jnp.zeros(3)))
        self._bcs = pf.normalize_bcs(mesh, tuple(bcs), rank=1)
        self._patch_index = {p_.name: i
                             for i, p_ in enumerate(mesh.patches)}

    def solve_points(self, boundary_disp: Dict[str, jnp.ndarray],
                     controls: Optional[Dict] = None) -> jnp.ndarray:
        """New point positions for prescribed per-moving-patch face
        displacements [size,3] (or a single [3] vector)."""
        mesh = self.mesh
        ctl = controls or {"solver": "PBiCGStab",
                           "preconditioner": "polynomial",
                           "tolerance": 1e-7, "relTol": 0.0,
                           "maxIter": 500}
        bcs = list(self._bcs)
        for name, val in boundary_disp.items():
            i = self._patch_index[name]
            p_ = mesh.patches[i]
            v = jnp.broadcast_to(jnp.asarray(val, mesh.v.dtype),
                                 (p_.size, 3))
            bcs[i] = bcs[i].replace(ref_value=v)
        D = VolField(data=jnp.zeros((mesh.n_cells, 3), mesh.v.dtype),
                     bcs=tuple(bcs), name="cellDisplacement",
                     dims=dimless)
        eqn = -fvm.laplacian(mesh, self._gamma, D, corrected=False,
                             gamma_dims=dimless)
        disp, perf = linear.solve(mesh, eqn, D.data, ctl)

        # volPointInterpolation + pinned boundary points
        nP = self.pm.n_points
        pdisp = jnp.zeros((nP, 3), mesh.v.dtype)
        pdisp = pdisp.at[self._rows].add(
            self._wts[:, None] * disp[self._cols])
        if self._fix_pts.shape[0]:
            pdisp = pdisp.at[self._fix_pts].set(0.0)
        # moving-patch points take the mean prescribed displacement of
        # their faces — exact for rigid/uniform patch motion
        for name, val in boundary_disp.items():
            v = jnp.asarray(val, mesh.v.dtype)
            v = v if v.ndim == 1 else jnp.mean(v, axis=0)
            pdisp = pdisp.at[self._mov_pts].set(v)
        pts0 = jnp.asarray(self.pm.points, mesh.v.dtype)
        return pts0 + pdisp
