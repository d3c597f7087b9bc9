"""MRF — multiple rotating reference frame zones.

Rebuild of reference: src/finiteVolume/cfdTools/general/MRF/
(MRFZone.C, MRFZones.C), read from constant/MRFZones. The absolute
velocity formulation: U is solved in the absolute frame, the flux phi
is the RELATIVE flux, and the zone contributes

  - Coriolis source     : Usource -= V * (omega x U)      (addCoriolis)
  - relative flux       : phi_f  -= (omega x (Cf-o)) . Sf (relativeFlux)
  - rotating wall BCs   : U_wall  = omega x (Cf-o)  (correctBoundaryVelocity)

Zone selection: cellZone names are not available (no zone reader yet) —
instead `selectionMode` box/cylinder/all on cell centres, the same
extension the fvOptions layer uses.  Face membership follows
MRFZone::setMRFFaces: internal faces with BOTH cells in the zone get
the relative-flux correction; boundary faces owned by zone cells get it
unless their patch is listed in nonRotatingPatches (those walls are
also the ones whose U is set to omega x r unless non-rotating).

All geometry-derived data (masks, per-face corrections) is host-side
numpy computed once at parse time; inside jit it enters as constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.dictionary import FoamDict
from ..ops import slot as slot_mod
from ..ops.matrix import FvMatrix


def _vec(v) -> np.ndarray:
    return np.asarray(v, dtype=float).reshape(3)


def _cell_mask(mesh, spec: FoamDict, name: str = "") -> np.ndarray:
    mode = str(spec.get("selectionMode", "all"))
    c = np.asarray(mesh.c)
    if mode == "all":
        # 2.2.x MRFZones name their entries after a mesh cellZone:
        # `rotor { origin ...; omega ...; }` — honour that when the
        # zone exists and no explicit selection was given
        masks = getattr(mesh, "cell_zone_masks", None) or {}
        zname = str(spec.get("cellZone", name))
        if "selectionMode" not in spec and zname in masks:
            return np.asarray(masks[zname]) > 0.5
        return np.ones(c.shape[0], dtype=bool)
    if mode in ("box", "boxToCell"):
        box = np.asarray(spec.get("box"), dtype=float).reshape(2, 3)
        return np.all((c >= box[0]) & (c <= box[1]), axis=1)
    if mode in ("cylinder", "cylinderToCell"):
        o = _vec(spec.get("origin", (0, 0, 0)))
        ax = _vec(spec.get("axis", (0, 0, 1)))
        ax = ax / max(np.linalg.norm(ax), 1e-30)
        r = float(spec.get("radius"))
        d = c - o
        axial = d @ ax
        rad = np.linalg.norm(d - axial[:, None] * ax[None, :], axis=1)
        m = rad <= r
        if "zMin" in spec or "zMax" in spec:
            m &= (axial >= float(spec.get("zMin", -1e30)))
            m &= (axial <= float(spec.get("zMax", 1e30)))
        return m
    if mode == "cellZone":
        name = str(spec.get("cellZone", spec.get("zoneName", "")))
        masks = getattr(mesh, "cell_zone_masks", None) or {}
        if name not in masks:
            raise KeyError(
                f"MRF cellZone {name!r} not found in mesh cellZones "
                f"(have: {sorted(masks)})")
        return np.asarray(masks[name]) > 0.5
    raise ValueError(f"unknown MRF selectionMode {mode!r}")


@dataclasses.dataclass(frozen=True)
class MRFZone:
    name: str
    origin: np.ndarray           # [3]
    omega_vec: np.ndarray        # [3] omega * axis
    cell_mask: np.ndarray        # [nC] bool
    face_corr: np.ndarray        # [nF] (omega x (Cf-o)).Sf on member faces
    patch_rotating: Tuple[bool, ...]  # per patch: walls whose U = omega x r


class MRFZones:
    """The MRFZones list; precomputes the flat per-face relative-flux
    correction summed over zones (zones must not overlap on faces)."""

    def __init__(self, mesh, zones: List[MRFZone]):
        self.zones = zones
        corr = np.zeros(mesh.n_faces)
        for z in zones:
            corr += z.face_corr
        self._corr_flat = corr
        cm = np.zeros(np.asarray(mesh.v).shape[0])
        om = np.zeros((np.asarray(mesh.v).shape[0], 3))
        for z in zones:
            cm = np.maximum(cm, z.cell_mask.astype(float))
            om[z.cell_mask] = z.omega_vec
        self._cell_mask = cm
        self._omega_cell = om

    def __bool__(self):
        return bool(self.zones)

    # ---- equation hook -------------------------------------------------------
    def add_coriolis(self, mesh, eqn: FvMatrix, U, rho: Any = None
                     ) -> FvMatrix:
        """Usource -= V*(omega x U) on zone cells (reference:
        MRFZone::addCoriolis; rho-weighted for compressible)."""
        om = jnp.asarray(self._omega_cell, mesh.v.dtype)
        m = jnp.asarray(self._cell_mask, mesh.v.dtype)
        w = mesh.v * m if rho is None else mesh.v * m * rho
        wxu = jnp.cross(om, U.data)
        return eqn.replace_fields(source=eqn.source - w[:, None] * wxu)

    # ---- flux hooks ----------------------------------------------------------
    def _corr_slot(self, mesh, scale: Any = None) -> slot_mod.SlotFace:
        corr = jnp.asarray(self._corr_flat, mesh.v.dtype)
        sl = slot_mod.from_flat(mesh, corr)
        if scale is not None:   # rho_f for mass fluxes
            sl = slot_mod.SlotFace(sl.sv * scale.sv, sl.fb * scale.fb,
                                   sl.bv * scale.bv)
        return sl

    def make_relative(self, mesh, phi_slot: slot_mod.SlotFace,
                      rho_slot: Optional[slot_mod.SlotFace] = None
                      ) -> slot_mod.SlotFace:
        c = self._corr_slot(mesh, rho_slot)
        return slot_mod.SlotFace(phi_slot.sv - c.sv, phi_slot.fb - c.fb,
                                 phi_slot.bv - c.bv)

    def make_relative_flat(self, mesh, phi: Any) -> Any:
        """Flat-array variant of make_relative (volumetric flux) for
        solvers on the flat face layout (interFoam family)."""
        return phi - jnp.asarray(self._corr_flat, mesh.v.dtype)

    def make_absolute(self, mesh, phi_slot: slot_mod.SlotFace,
                      rho_slot: Optional[slot_mod.SlotFace] = None
                      ) -> slot_mod.SlotFace:
        c = self._corr_slot(mesh, rho_slot)
        return slot_mod.SlotFace(phi_slot.sv + c.sv, phi_slot.fb + c.fb,
                                 phi_slot.bv + c.bv)

    def relative_flux_b(self, mesh, phi_b: Any) -> Any:
        """Boundary-only correction (for phiHbyA boundary values)."""
        nif = mesh.n_internal_faces
        return phi_b - jnp.asarray(self._corr_flat[nif:], mesh.v.dtype)

    # ---- BC hook (host-side, once) -------------------------------------------
    def correct_boundary_velocity(self, mesh, U):
        """Set U = omega x (Cf - origin) on rotating zone wall faces
        (reference: MRFZone::correctBoundaryVelocity). Host-side: run
        once after reading fields, before jit."""
        from ..bc import patchfields as pf

        cf = np.asarray(mesh.cf)
        owner = np.asarray(mesh.owner)
        bcs = list(U.bcs)
        for z in self.zones:
            for ip, patch in enumerate(mesh.patches):
                if not z.patch_rotating[ip]:
                    continue
                bc = bcs[ip]
                if not pf.is_value_bc(bc):
                    continue
                s, e = patch.start, patch.start + patch.size
                in_zone = z.cell_mask[owner[s:e]]
                r = cf[s:e] - z.origin
                urot = np.cross(np.broadcast_to(z.omega_vec, r.shape), r)
                old = np.broadcast_to(np.asarray(bc.ref_value),
                                      (patch.size, 3)).copy()
                old[in_zone] = urot[in_zone]
                bcs[ip] = bc.replace(
                    ref_value=jnp.asarray(old, mesh.v.dtype))
        return dataclasses.replace(U, bcs=tuple(bcs))


def _build_zone(mesh, name: str, spec: FoamDict) -> MRFZone:
    origin = _vec(spec.get("origin", (0.0, 0.0, 0.0)))
    axis = _vec(spec.get("axis", (0.0, 0.0, 1.0)))
    axis = axis / max(np.linalg.norm(axis), 1e-30)
    om = spec.get("omega", 0.0)
    if isinstance(om, (list, tuple)):        # dimensionedScalar form
        om = om[-1]
    omega_vec = float(om) * axis
    cmask = _cell_mask(mesh, spec, name=name)
    non_rot = {str(s) for s in (spec.get("nonRotatingPatches") or [])}

    owner = np.asarray(mesh.owner)
    neighbour = np.asarray(mesh.neighbour)
    nif = mesh.n_internal_faces
    cf = np.asarray(mesh.cf)
    sf = np.asarray(mesh.sf)
    fmask = np.zeros(mesh.n_faces, dtype=bool)
    fmask[:nif] = cmask[owner[:nif]] & cmask[neighbour[:nif]]
    patch_rotating = []
    for patch in mesh.patches:
        s, e = patch.start, patch.start + patch.size
        rot = patch.name not in non_rot and patch.type != "empty"
        patch_rotating.append(rot)
        # reference MRFZone::relativeFlux corrects includedFaces
        # (rotating patches) AND excludedFaces (nonRotatingPatches)
        # owned by zone cells — only empty patches are skipped
        # (ADVICE r2 #3); patch_rotating alone gates the velocity BC.
        if patch.type != "empty":
            fmask[s:e] = cmask[owner[s:e]]
    urot_f = np.cross(np.broadcast_to(omega_vec, cf.shape), cf - origin)
    face_corr = np.where(fmask, np.einsum("fd,fd->f", urot_f, sf), 0.0)
    return MRFZone(name=name, origin=origin, omega_vec=omega_vec,
                   cell_mask=cmask, face_corr=face_corr,
                   patch_rotating=tuple(patch_rotating))


def from_dict(mesh, d) -> MRFZones:
    """Parse an MRFZones dictionary. Accepts both the 2.2.x list form
      N ( rotor { ... } ... )
    flattened by the dictionary parser, and a plain dict of zone
    entries."""
    zones: List[MRFZone] = []

    def walk(obj, name="zone"):
        if isinstance(obj, FoamDict):
            if "omega" in obj or "axis" in obj or "origin" in obj:
                zones.append(_build_zone(mesh, name, obj))
            else:
                for k, v in obj.items():
                    walk(v, str(k))
        elif isinstance(obj, (list, tuple)):
            pending = name
            for item in obj:
                if isinstance(item, str):
                    pending = item
                else:
                    walk(item, pending)

    walk(d)
    return MRFZones(mesh, zones)


def make_relative_state(mesh, mrf: MRFZones, state: Dict) -> Dict:
    """Convert the initial absolute flux in a solver state to the
    relative flux (reference: createPhi + relativeFlux at startup)."""
    sl = mrf.make_relative(mesh, slot_mod.from_flat(mesh, state["phi"]))
    st = dict(state)
    st["phi"] = slot_mod.to_flat(mesh, sl)
    st["phi_slot"] = (sl.sv, sl.fb)
    return st


def from_case(case) -> Optional[MRFZones]:
    """Read constant/MRFZones if present (reference: MRFZones
    constructed from an IOdictionary of that name)."""
    import os

    from ..core.dictionary import parse_file

    path = case.const_path("MRFZones")
    if not os.path.exists(path):
        return None
    z = from_dict(case.mesh, parse_file(path))
    return z if z else None
