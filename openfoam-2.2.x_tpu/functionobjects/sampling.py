"""Sampling + wall post-processing function objects.

Reference: src/sampling/ (probes/sampledSets) and
src/postProcessing/functionObjects/utilities/ (yPlusRAS,
wallShearStress) + field/streamLine. Output layout mirrors the
reference: postProcessing/<name>/<time>/ series files.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from ..bc import patchfields as pfm
from .base import FunctionObject, register

_CMU = 0.09
_KAPPA = 0.41


def _nu_of(case) -> float:
    from ..core.dictionary import dimensioned_scalar

    try:
        _, nu = dimensioned_scalar(case.transport_properties()["nu"])
        return float(nu)
    except Exception:
        return 0.0


def _wall_patches(mesh, spec):
    pats = spec.get("patches")
    if pats is not None:
        names = {str(p) for p in (pats if isinstance(pats, list) else [pats])}
        return [p for p in mesh.patches if p.name in names]
    return [p for p in mesh.patches if p.type == "wall"]


def _wall_shear(mesh, state, nu):
    """Per-wall-patch shear stress tau_w = (nu+nut_w) dU_t/dn [nPf,3]."""
    U = state["U"]
    nut_bcs = None
    if "turb" in state and state["turb"] and "nut" in state["turb"]:
        nut_f = state["turb"]["nut"]
    else:
        nut_f = None
    out = {}
    for p, bc in zip(mesh.patches, U.bcs):
        if p.type != "wall":
            continue
        cells = mesh.owner[p.slice]
        dc = mesh.delta_coeffs[p.slice]
        ub = pfm.evaluate(bc, mesh, p, U.data)
        dudn = (ub - U.data[cells]) * dc[:, None]
        nutw = 0.0
        if nut_f is not None:
            for pp, nbc in zip(mesh.patches, nut_f.bcs):
                if pp.name == p.name:
                    nutw = pfm.evaluate(nbc, mesh, pp, nut_f.data)
        nue = nu + nutw
        tau = (nue[:, None] if hasattr(nue, "ndim") and getattr(nue, "ndim", 0)
               else nue) * dudn
        out[p.name] = tau
    return out


class YPlus(FunctionObject):
    """yPlusRAS equivalent: y+ per wall patch from the wall shear
    (utau = sqrt(|tau_w|)), min/max/average written per step
    (reference: applications/utilities/postProcessing/wall/yPlusRAS +
    the 2.3 yPlus functionObject)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.path = os.path.join(self.out_dir, "yPlus.dat")
        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write("# Time patch min max average\n")

    def execute(self, time_name, state):
        mesh = self.case.mesh
        nu = _nu_of(self.case)
        taus = _wall_shear(mesh, state, nu)
        lines = []
        for p in _wall_patches(mesh, self.spec):
            tau = taus.get(p.name)
            if tau is None:
                continue
            y = 1.0 / np.maximum(np.asarray(mesh.delta_coeffs[p.slice]),
                                 1e-30)
            utau = np.sqrt(np.linalg.norm(np.asarray(tau), axis=1))
            ypl = utau * y / max(nu, 1e-30)
            lines.append(f"{time_name} {p.name} {ypl.min():.6g} "
                         f"{ypl.max():.6g} {ypl.mean():.6g}\n")
        with open(self.path, "a") as f:
            f.writelines(lines)


class WallShearStress(FunctionObject):
    """wallShearStress functionObject (reference:
    postProcessing/functionObjects/utilities/wallShearStress): writes
    per-patch min/max of the shear vector magnitude."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.path = os.path.join(self.out_dir, "wallShearStress.dat")
        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write("# Time patch min max\n")

    def execute(self, time_name, state):
        mesh = self.case.mesh
        nu = _nu_of(self.case)
        taus = _wall_shear(mesh, state, nu)
        lines = []
        for p in _wall_patches(mesh, self.spec):
            tau = taus.get(p.name)
            if tau is None:
                continue
            mag = np.linalg.norm(np.asarray(tau), axis=1)
            lines.append(f"{time_name} {p.name} {mag.min():.6g} "
                         f"{mag.max():.6g}\n")
        with open(self.path, "a") as f:
            f.writelines(lines)


class SampledSets(FunctionObject):
    """sets: line/cloud sampling of fields by nearest cell (reference:
    src/sampling/sampledSet/ + the `sets` functionObject). Supported
    set types: uniform (start/end/nPoints), cloud (points). Writes
    <time>/<setName>_<fields>.xy in the reference's raw format."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.fields = [str(f) for f in spec.get("fields", ["U", "p"])]
        self.sets: List[Dict[str, Any]] = []
        sets = spec.get("sets", {})
        items = (sets.items() if hasattr(sets, "items")
                 else [(s.get("name", f"set{i}"), s)
                       for i, s in enumerate(sets)])
        mesh = case.mesh
        c = np.asarray(mesh.c)
        from scipy.spatial import cKDTree

        tree = cKDTree(c)
        for sname, sd in items:
            stype = str(sd.get("type", "uniform"))
            if stype in ("uniform", "lineUniform", "midPoint",
                         "midPointAndFace", "face"):
                start = np.asarray(sd.get("start"), dtype=float).reshape(3)
                end = np.asarray(sd.get("end"), dtype=float).reshape(3)
                n = int(sd.get("nPoints", 100))
                pts = start[None, :] + (end - start)[None, :] * \
                    np.linspace(0.0, 1.0, n)[:, None]
            elif stype == "cloud":
                pts = np.asarray(sd.get("points"), dtype=float).reshape(-1, 3)
            else:
                raise ValueError(f"unknown set type {stype!r}")
            _, idx = tree.query(pts)
            dist = np.linalg.norm(pts - pts[0], axis=1)
            self.sets.append({"name": str(sname), "pts": pts, "idx": idx,
                              "dist": dist})

    def execute(self, time_name, state):
        tdir = os.path.join(self.out_dir, time_name)
        os.makedirs(tdir, exist_ok=True)
        for s in self.sets:
            cols = [s["dist"]]
            names = []
            for fname in self.fields:
                fld = state.get(fname)
                if fld is None and "turb" in state and state["turb"]:
                    fld = state["turb"].get(fname)
                if fld is None:
                    continue
                data = np.asarray(fld.data if hasattr(fld, "data") else fld)
                vals = data[s["idx"]]
                if vals.ndim == 1:
                    cols.append(vals)
                else:
                    cols.extend(vals.T)
                names.append(fname)
            arr = np.column_stack(cols)
            path = os.path.join(tdir, f"{s['name']}_{'_'.join(names)}.xy")
            np.savetxt(path, arr, fmt="%.8g")


class StreamLine(FunctionObject):
    """streamLine functionObject (reference:
    postProcessing/functionObjects/field/streamLine): integrates
    trajectories through the cell-centred velocity (RK2, nearest-cell
    lookup) from seed points; writes <time>/tracks.xy."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        sd = spec.get("seedSampleSet", spec)
        if "points" in sd:
            self.seeds = np.asarray(sd.get("points"),
                                    dtype=float).reshape(-1, 3)
        else:
            start = np.asarray(sd.get("start", (0, 0, 0)),
                               dtype=float).reshape(3)
            end = np.asarray(sd.get("end", (1, 0, 0)),
                             dtype=float).reshape(3)
            n = int(sd.get("nPoints", 10))
            self.seeds = start[None, :] + (end - start)[None, :] * \
                np.linspace(0.0, 1.0, n)[:, None]
        self.n_steps = int(spec.get("lifeTime", 200))
        mesh = case.mesh
        from scipy.spatial import cKDTree

        self._tree = cKDTree(np.asarray(mesh.c))
        # step length ~ half a cell size
        self._h = 0.5 * float(np.mean(np.cbrt(np.asarray(mesh.v))))
        c = np.asarray(mesh.c)
        self._lo, self._hi = c.min(axis=0), c.max(axis=0)

    def execute(self, time_name, state):
        U = np.asarray(state["U"].data)

        def vel(p):
            _, i = self._tree.query(p)
            return U[i]

        tdir = os.path.join(self.out_dir, time_name)
        os.makedirs(tdir, exist_ok=True)
        rows = []
        for si, seed in enumerate(self.seeds):
            p = seed.copy()
            rows.append((si, *p))
            for _ in range(self.n_steps):
                u1 = vel(p)
                sp = np.linalg.norm(u1)
                if sp < 1e-12:
                    break
                h = self._h / sp
                mid = p + 0.5 * h * u1
                u2 = vel(mid)
                p = p + h * u2
                if np.any(p < self._lo - self._h * 4) or \
                        np.any(p > self._hi + self._h * 4):
                    break
                rows.append((si, *p))
        arr = np.asarray(rows)
        np.savetxt(os.path.join(tdir, "tracks.xy"), arr,
                   fmt="%d %.8g %.8g %.8g")


register("yPlus", YPlus)
register("yPlusRAS", YPlus)
register("wallShearStress", WallShearStress)
register("sets", SampledSets)
register("streamLine", StreamLine)
