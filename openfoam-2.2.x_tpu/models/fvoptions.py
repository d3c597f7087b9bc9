"""fvOptions — run-time-selectable sources/constraints injected into
equations.

Rebuild of reference: src/fvOptions/ (fv::option, fv::optionList, NEW
in 2.2.0) read from system/fvOptions (or constant/fvOptions). Supported
option types:

- semiImplicitSource        explicit Su + implicit Sp volume sources
                            (reference: sources/general/semiImplicitSource)
- meanVelocityForce /       body force adjusted each iteration to hold
  pressureGradientExplicitSource  a prescribed bulk velocity Ubar
                            (reference: sources/derived/meanVelocityForce)
- explicitPorositySource    Darcy-Forchheimer porous sink
                            -(mu d + rho/2 |U| f) U on the zone
                            (reference: sources/derived/explicitPorositySource
                            + cfdTools porousZone)
- actuationDiskSource       momentum sink of an actuator disk,
                            T = 2 rho A a (1-a) Uo^2 spread over the zone
                            (reference: sources/derived/actuationDiskSource)
- rotorDiskSource           blade-element momentum rotor: per-cell
                            thrust + swirl from twist/chord blade
                            tables and cl/cd profile lookup, trimModel
                            fixed (reference: sources/derived/
                            rotorDiskSource)
- MRFSource (Coriolis)      rotating-frame Coriolis force -2w x U ->
                            here the MRF zone term -(w x U) as in
                            MRFZone::addCoriolis (reference:
                            cfdTools/general/MRF/MRFZone.C). NOTE: the
                            zone-face relative-flux correction is not
                            yet applied — valid for zones whose
                            boundaries are far from the rotating region.

Zone selection (selectionMode): `all`, or `box` ((min) (max)) on cell
centres — the topoSet/cellZone machinery equivalent for box regions;
`cellZone` names require mesh zones (not yet read) and raise.

All option data is static trace-time config; per-iteration state (the
meanVelocityForce gradient) lives in the solver state under
state["fvopt"].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.dictionary import FoamDict, dimensioned_scalar
from ..ops import fvm
from ..ops.matrix import FvMatrix


def _zone_mask(mesh, spec: FoamDict) -> Any:
    mode = str(spec.get("selectionMode", "all"))
    c = np.asarray(mesh.c)
    if mode == "all":
        m = np.ones(c.shape[0])
    elif mode in ("box", "boxToCell"):
        box = np.asarray(spec.get("box")).reshape(2, 3)
        m = np.all((c >= box[0]) & (c <= box[1]), axis=1).astype(float)
    elif mode == "cellZone":
        name = str(spec.get("cellZone", spec.get("zoneName", "")))
        masks = getattr(mesh, "cell_zone_masks", None) or {}
        if name not in masks:
            raise KeyError(
                f"cellZone {name!r} not found in mesh cellZones "
                f"(have: {sorted(masks)})")
        return jnp.asarray(masks[name], np.asarray(mesh.v).dtype)
    else:
        raise ValueError(f"unknown selectionMode {mode!r}")
    return jnp.asarray(m, np.asarray(mesh.v).dtype)


def _vec(v) -> np.ndarray:
    return np.asarray(v, dtype=float).reshape(3)


@dataclasses.dataclass
class Option:
    name: str
    kind: str
    mask: Any                  # [nC] 1/0 zone mask
    fields: Tuple[str, ...]
    data: Dict[str, Any]

    # ---- equation hooks -----------------------------------------------------
    def add_to(self, mesh, eqn: FvMatrix, field_name: str, field,
               U=None, fvopt_state=None, rho=None, mu=None) -> FvMatrix:
        """rho/mu: present for mass-weighted (compressible) equations —
        porosity drag becomes mu*d + 0.5*rho*f*|U| (reference:
        porosityModel applied to fvm::ddt(rho,U) rows)."""
        if field_name not in self.fields:
            return eqn
        k = self.kind
        d = self.data
        m = self.mask
        if k == "semiImplicitSource":
            su, sp = d["Su"].get(field_name), d["Sp"].get(field_name)
            if su is not None:
                su_v = jnp.asarray(su, mesh.v.dtype)
                v = mesh.v * m
                add = (v[:, None] * su_v[None, :] if np.ndim(su) == 1
                       else v * su_v)
                eqn = eqn.replace_fields(source=eqn.source + add)
            if sp is not None:
                # implicit sp*psi: diag -= V*sp (sp<0 stabilises)
                eqn = eqn.replace_fields(
                    diag=eqn.diag - mesh.v * m * float(sp))
            return eqn
        if k == "codedSource":
            src = jnp.asarray(d["source"], mesh.v.dtype)
            v = mesh.v * m
            add = v[:, None] * src if src.ndim == 2 else v * src
            return eqn.replace_fields(source=eqn.source + add)
        if k == "meanVelocityForce":
            gradp = (fvopt_state or {}).get(f"gradP_{self.name}",
                                            jnp.zeros((), mesh.v.dtype))
            fdir = jnp.asarray(d["flowDir"], mesh.v.dtype)
            add = (mesh.v * m)[:, None] * gradp * fdir[None, :]
            return eqn.replace_fields(source=eqn.source + add)
        if k == "explicitPorositySource":
            dd = jnp.asarray(d["d"], mesh.v.dtype)
            ff = jnp.asarray(d["f"], mesh.v.dtype)
            nu = float(d.get("nu", 0.0))
            magU = jnp.linalg.norm(U.data, axis=1)
            # anisotropic Darcy-Forchheimer (reference:
            # porosityModel::DarcyForchheimer with coordinateSystem):
            # coefficient tensor C = visc*D + 0.5*rho|U|*F in MESH axes
            # (D/F = R diag(d/f) R^T). Semi-implicit split: the
            # isotropic part tr(C)/3 goes on the diagonal, the
            # anisotropic remainder is an explicit source.
            Dm = jnp.asarray(d.get("D", np.diag(np.asarray(
                d["d"], float))), mesh.v.dtype)
            Fm = jnp.asarray(d.get("F", np.diag(np.asarray(
                d["f"], float))), mesh.v.dtype)
            if rho is not None:
                visc = mu if mu is not None else nu * rho
                half_f = 0.5 * magU * rho
            else:
                visc = jnp.asarray(nu, mesh.v.dtype)
                half_f = 0.5 * magU
            # C [nC,3,3]
            C = (jnp.broadcast_to(visc, magU.shape)[:, None, None]
                 * Dm[None] + half_f[:, None, None] * Fm[None])
            iso = jnp.trace(C, axis1=1, axis2=2) / 3.0
            aniso = C - iso[:, None, None] * jnp.eye(3, dtype=C.dtype)
            src = -jnp.einsum("cij,cj->ci", aniso, U.data)                 * (mesh.v * m)[:, None]
            return eqn.replace_fields(
                diag=eqn.diag + mesh.v * m * iso,
                source=eqn.source + src)
        if k == "actuationDiskSource":
            Cp, Ct = float(d["Cp"]), float(d["Ct"])
            area = float(d["diskArea"])
            ddir = _vec(d["diskDir"])
            ddir = ddir / max(np.linalg.norm(ddir), 1e-30)
            a = 1.0 - Cp / max(Ct, 1e-30)
            upstream = jnp.asarray(d.get("upstreamU", 1.0), mesh.v.dtype)
            vol_zone = jnp.maximum(jnp.sum(mesh.v * m), 1e-30)
            T = 2.0 * area * upstream ** 2 * a * (1.0 - a)
            f = -(T / vol_zone) * jnp.asarray(ddir, mesh.v.dtype)
            add = (mesh.v * m)[:, None] * f[None, :]
            return eqn.replace_fields(source=eqn.source + add)
        if k == "rotorDiskSource":
            # blade-element momentum rotor (reference: src/fvOptions/
            # sources/derived/rotorDiskSource/rotorDiskSource.C +
            # bladeModel/profileModel lookup tables, trimModel fixed).
            # Per zone cell at radius r the blade section sees the
            # relative wind W = (u_ax, u_th - omega r) in (axis,
            # tangent) coordinates; with inflow angle
            #   phi = atan2(-u_ax, omega r - u_th)
            # and effective AoA alpha = twist(r) - phi, the profile
            # cl/cd produce a force ON THE FLUID per unit span
            #   f_a = -(cl cos phi - cd sin phi) q c   (thrust, -axis)
            #   f_t = +(cl sin phi + cd cos phi) q c   (swirl, +e_t)
            # distributed over the annulus volume by nB/(2 pi r dz).
            axis_v = jnp.asarray(d["axis"], mesh.v.dtype)
            e_t = jnp.asarray(d["e_t"], mesh.v.dtype)
            r = jnp.asarray(d["r_cell"], mesh.v.dtype)
            twist = jnp.asarray(d["twist_cell"], mesh.v.dtype)
            chord = jnp.asarray(d["chord_cell"], mesh.v.dtype)
            aoa_t = jnp.asarray(d["aoa_tab"], mesh.v.dtype)
            cl_t = jnp.asarray(d["cl_tab"], mesh.v.dtype)
            cd_t = jnp.asarray(d["cd_tab"], mesh.v.dtype)
            omega = float(d["omega"])
            dens = jnp.asarray(d["dens"], mesh.v.dtype)  # nB/(2 pi r dz)
            u_ax = U.data @ axis_v
            u_th = jnp.sum(U.data * e_t, axis=1)
            w_t = omega * r - u_th
            phi_i = jnp.arctan2(-u_ax, jnp.where(jnp.abs(w_t) > 1e-12,
                                                 w_t, 1e-12))
            alpha = twist - phi_i
            cl = jnp.interp(alpha, aoa_t, cl_t)
            cd = jnp.interp(alpha, aoa_t, cd_t)
            V2 = u_ax ** 2 + w_t ** 2
            # q in kinematic units for the incompressible U equation
            # (the reference multiplies by rhoRef and the solver
            # divides it back out); local rho for mass-weighted rows
            q = 0.5 * V2 * chord * (rho if rho is not None else 1.0)
            cphi, sphi = jnp.cos(phi_i), jnp.sin(phi_i)
            f_a = -(cl * cphi - cd * sphi) * q
            f_t = (cl * sphi + cd * cphi) * q
            fvec = (f_a * dens)[:, None] * axis_v[None, :] \
                + (f_t * dens)[:, None] * e_t
            add = (mesh.v * m)[:, None] * fvec
            return eqn.replace_fields(source=eqn.source + add)
        if k == "MRFSource":
            omega = jnp.asarray(d["omega_vec"], mesh.v.dtype)
            wxu = jnp.cross(jnp.broadcast_to(omega, U.data.shape), U.data)
            add = -(mesh.v * m)[:, None] * wxu
            return eqn.replace_fields(source=eqn.source + add)
        if k == "fixedTemperatureConstraint":
            # exact row replacement in the zone (reference:
            # fvOptions/constraints/fixedTemperatureConstraint)
            tset = jnp.full(mesh.n_cells, float(d["temperature"]),
                            mesh.v.dtype)
            return eqn.set_values(m, tset, mesh)
        if k == "temperatureLimitsConstraint":
            # constrain only the cells currently OUTSIDE the limits to
            # the clipped value (reference: fvOptions/constraints/
            # temperatureLimitsConstraint — there applied post-solve;
            # the in-matrix form converges to the same fixed point)
            tmin, tmax = float(d["Tmin"]), float(d["Tmax"])
            cur = field.data if hasattr(field, "data") else field
            viol = m * jnp.where((cur < tmin) | (cur > tmax), 1.0, 0.0)
            return eqn.set_values(viol,
                                  jnp.clip(cur, tmin, tmax), mesh)
        if k == "radialActuationDiskSource":
            Cp, Ct = float(d["Cp"]), float(d["Ct"])
            area = float(d["diskArea"])
            ddir = _vec(d["diskDir"])
            ddir = ddir / max(np.linalg.norm(ddir), 1e-30)
            a = 1.0 - Cp / max(Ct, 1e-30)
            upstream = jnp.asarray(d.get("upstreamU", 1.0),
                                   mesh.v.dtype)
            T = 2.0 * area * upstream ** 2 * a * (1.0 - a)
            # radial profile Tr(r) = T (c0 + c1 r^2 + c2 r^4),
            # normalised so the zone-integrated thrust equals T
            # (reference: radialActuationDiskSource::addRadialActuationDiskAxialInertialResistance)
            r = jnp.asarray(d["r_cell"], mesh.v.dtype)
            c0, c1, c2 = (float(x) for x in d["coeffs"])
            prof = c0 + c1 * r ** 2 + c2 * r ** 4
            wsum = jnp.maximum(jnp.sum(mesh.v * m * prof), 1e-30)
            f_mag = T * prof / wsum
            add = -(mesh.v * m * f_mag)[:, None] \
                * jnp.asarray(ddir, mesh.v.dtype)[None, :]
            return eqn.replace_fields(source=eqn.source + add)
        return eqn

    # ---- post-solve corrections (meanVelocityForce gradP update) -----------
    def correct(self, mesh, U, rAU, fvopt_state: Dict) -> Tuple[Any, Dict]:
        if self.kind != "meanVelocityForce":
            return U, fvopt_state
        d = self.data
        m = self.mask
        fdir = jnp.asarray(d["flowDir"], mesh.v.dtype)
        ubar = float(d["Ubar_mag"])
        vz = jnp.maximum(jnp.sum(mesh.v * m), 1e-30)
        ubar_now = jnp.sum(mesh.v * m * (U.data @ fdir)) / vz
        rAU_bar = jnp.sum(mesh.v * m * rAU) / vz
        dgrad = (ubar - ubar_now) / jnp.maximum(rAU_bar, 1e-30)
        # velocity nudged immediately (reference: U += rAU*dGradP*dir),
        # gradP accumulated for the next iteration's source
        Unew = U.with_data(
            U.data + (m * rAU * dgrad)[:, None] * fdir[None, :])
        key = f"gradP_{self.name}"
        st = dict(fvopt_state)
        st[key] = st.get(key, jnp.zeros((), mesh.v.dtype)) + dgrad
        return Unew, st


class OptionList:
    """fv::optionList — applies every active option to an equation."""

    def __init__(self, options: List[Option]):
        self.options = options

    def __bool__(self):
        return bool(self.options)

    def add_to(self, mesh, eqn, field_name, field, U=None,
               fvopt_state=None, rho=None, mu=None):
        for o in self.options:
            eqn = o.add_to(mesh, eqn, field_name, field, U=U,
                           fvopt_state=fvopt_state, rho=rho, mu=mu)
        return eqn

    def correct_U(self, mesh, U, rAU, fvopt_state: Optional[Dict]):
        st = dict(fvopt_state or {})
        for o in self.options:
            U, st = o.correct(mesh, U, rAU, st)
        return U, st

    def init_state(self, mesh) -> Dict:
        st = {}
        for o in self.options:
            if o.kind == "meanVelocityForce":
                st[f"gradP_{o.name}"] = jnp.zeros((), mesh.v.dtype)
        return st




def _coord_rotation(spec: FoamDict) -> np.ndarray:
    """coordinateSystem { coordinateRotation { e1 (..); e2/e3 (..); } }
    -> rotation matrix R with columns = local axes (reference:
    src/meshTools/coordinateSystems/ axesRotation)."""
    cs = spec.get("coordinateSystem", spec)
    rot = cs.get("coordinateRotation", cs) if hasattr(cs, "get") else cs
    if not hasattr(rot, "get"):
        return np.eye(3)
    e1 = rot.get("e1")
    if e1 is None:
        return np.eye(3)
    e1 = _vec(e1)
    e1 = e1 / max(np.linalg.norm(e1), 1e-30)
    if rot.get("e2") is not None:
        e2 = _vec(rot.get("e2"))
        e2 = e2 - (e2 @ e1) * e1
        e2 = e2 / max(np.linalg.norm(e2), 1e-30)
        e3 = np.cross(e1, e2)
    else:
        e3 = _vec(rot.get("e3", (0.0, 0.0, 1.0)))
        e3 = e3 - (e3 @ e1) * e1
        e3 = e3 / max(np.linalg.norm(e3), 1e-30)
        e2 = np.cross(e3, e1)
    return np.stack([e1, e2, e3], axis=1)


def _rotated_tensor(vec3: np.ndarray, R: np.ndarray) -> np.ndarray:
    """R diag(v) R^T — the principal-axis tensor in mesh axes."""
    return R @ np.diag(np.asarray(vec3, float)) @ R.T


def _parse_option(mesh, name: str, spec: FoamDict, nu: float) -> Option:
    kind = str(spec.get("type"))
    sub = spec.get(f"{kind}Coeffs", spec)
    mask = _zone_mask(mesh, sub if "selectionMode" in sub else spec)
    if kind == "semiImplicitSource":
        inj = sub.get("injectionRateSuSp", FoamDict())
        su: Dict[str, Any] = {}
        sp: Dict[str, Any] = {}
        fields = []
        for fname, pair in inj.items():
            fname = str(fname)
            fields.append(fname)
            arr = list(np.asarray(pair, dtype=object).reshape(-1)) \
                if not isinstance(pair, (list, tuple)) else list(pair)
            su[fname] = np.asarray(arr[0], dtype=float)
            sp[fname] = float(arr[1]) if len(arr) > 1 else 0.0
        return Option(name, kind, mask, tuple(fields),
                      {"Su": su, "Sp": sp})
    if kind in ("meanVelocityForce", "pressureGradientExplicitSource",
                "patchMeanVelocityForce"):
        ub = _vec(sub.get("Ubar"))
        mag = float(np.linalg.norm(ub))
        fdir = ub / max(mag, 1e-30)
        fields = tuple(str(f) for f in sub.get("fieldNames", ["U"]))
        return Option(name, "meanVelocityForce", mask, fields or ("U",),
                      {"Ubar_mag": mag, "flowDir": fdir})
    if kind in ("explicitPorositySource", "DarcyForchheimer"):
        dtab = sub.get("DarcyForchheimerCoeffs", sub)
        dvec = _vec(dtab.get("d", (0.0, 0.0, 0.0)) if "d" not in sub
                    else sub["d"])
        fvec = _vec(dtab.get("f", (0.0, 0.0, 0.0)) if "f" not in sub
                    else sub["f"])
        R = _coord_rotation(dtab if hasattr(dtab, "get") else sub)
        return Option(name, "explicitPorositySource", mask, ("U",),
                      {"d": dvec, "f": fvec, "nu": nu,
                       "D": _rotated_tensor(dvec, R),
                       "F": _rotated_tensor(fvec, R)})
    if kind == "actuationDiskSource":
        return Option(name, kind, mask, ("U",), {
            "Cp": float(sub.get("Cp", 0.386)),
            "Ct": float(sub.get("Ct", 0.58)),
            "diskArea": float(sub.get("diskArea", 1.0)),
            "diskDir": _vec(sub.get("diskDir", (1.0, 0.0, 0.0))),
            "upstreamU": float(sub.get("upstreamU", 1.0)),
        })
    if kind in ("codedSource", "scalarCodedSource",
                "vectorCodedSource"):
        # dynamicCode analogue (reference: fvOptions codedSource +
        # #codeStream): the `codeAddSup` PYTHON snippet runs ONCE at
        # parse with {np, jnp, C [nC,3] cell centres, V [nC]} in scope
        # and assigns `source` ([nC] or [nC,3], per-volume rate); the
        # result is added explicitly to the named fields' equations.
        code = sub.get("codeAddSup", sub.get("code"))
        fields = tuple(str(f) for f in sub.get("fields",
                                               sub.get("fieldNames",
                                                       ["U"])))
        ns = {"np": np, "jnp": None, "C": np.asarray(mesh.c),
              "V": np.asarray(mesh.v), "source": None}
        import jax.numpy as _jnp

        ns["jnp"] = _jnp
        exec(compile(str(code), f"<codedSource:{name}>", "exec"), ns)  # noqa: S102
        src = ns.get("source")
        if src is None:
            raise ValueError(f"codedSource {name!r}: the snippet must "
                             "assign `source`")
        return Option(name, "codedSource", mask, fields,
                      {"source": np.asarray(src, dtype=float)})
    if kind == "fixedTemperatureConstraint":
        t_ent = sub.get("temperature", 300.0)
        if isinstance(t_ent, (list, tuple)):
            t_ent = t_ent[-1]
        fields = tuple(str(f) for f in sub.get("fieldNames", ["T"]))
        return Option(name, kind, mask, fields or ("T",),
                      {"temperature": float(np.asarray(
                          t_ent, dtype=float).reshape(-1)[-1])})
    if kind in ("temperatureLimitsConstraint", "limitTemperature"):
        return Option(name, "temperatureLimitsConstraint", mask,
                      ("T",),
                      {"Tmin": float(sub.get("Tmin",
                                             sub.get("min", 0.0))),
                       "Tmax": float(sub.get("Tmax",
                                             sub.get("max", 5000.0)))})
    if kind == "radialActuationDiskSource":
        ddir = _vec(sub.get("diskDir", (1.0, 0.0, 0.0)))
        ddir = ddir / max(np.linalg.norm(ddir), 1e-30)
        c = np.asarray(mesh.c)
        zone_c = c[np.asarray(mask) > 0]
        centre = zone_c.mean(axis=0) if zone_c.size else c.mean(axis=0)
        rel = c - centre
        r_cell = np.linalg.norm(rel - np.outer(rel @ ddir, ddir),
                                axis=1)
        coeffs = np.asarray(sub.get("coeffs", (0.1, 0.5, 0.01)),
                            dtype=float).reshape(-1)[:3]
        return Option(name, kind, mask, ("U",), {
            "Cp": float(sub.get("Cp", 0.386)),
            "Ct": float(sub.get("Ct", 0.58)),
            "diskArea": float(sub.get("diskArea", 1.0)),
            "diskDir": ddir,
            "upstreamU": float(sub.get("upstreamU", 1.0)),
            "r_cell": r_cell, "coeffs": tuple(coeffs)})
    if kind == "rotorDiskSource":
        # geometry: origin/axis (geometryMode specified); blade table
        # rows (profileName (r twist_deg chord)) or (r (twist chord));
        # profiles { <name> { type lookup; data ((aoa_deg (cd cl))..) } }
        origin = _vec(sub.get("origin", (0.0, 0.0, 0.0)))
        axis = _vec(sub.get("axis", (0.0, 0.0, 1.0)))
        axis = axis / max(np.linalg.norm(axis), 1e-30)
        rpm = float(sub.get("rpm", 0.0))
        omega = rpm * 2.0 * np.pi / 60.0
        n_blades = float(sub.get("nBlades", 2))
        tip = float(sub.get("tipEffect", 1.0))
        blade_rows = (sub.get("blade", FoamDict()) or FoamDict()
                      ).get("data", [])
        rs, tws, chs = [], [], []
        for row in blade_rows:
            row = list(row)
            if row and isinstance(row[0], str):   # (name (r tw ch))
                row = list(np.asarray(row[1], float).reshape(-1))
            else:
                flat = []
                for x in row:
                    flat += list(np.asarray(x, float).reshape(-1))
                row = flat
            rs.append(row[0]); tws.append(row[1]); chs.append(row[2])
        if not rs:
            rs, tws, chs = [0.0, 1.0], [8.0, 8.0], [0.1, 0.1]
        rs, tws, chs = (np.asarray(rs, float), np.asarray(tws, float),
                        np.asarray(chs, float))
        profs = sub.get("profiles", FoamDict()) or FoamDict()
        aoa, cdt, clt = [], [], []
        for _, pspec in profs.items():
            if not hasattr(pspec, "get"):
                continue
            for prow in pspec.get("data", []):
                prow = list(prow)
                vals = list(np.asarray(prow[-1], float).reshape(-1)) \
                    if isinstance(prow[-1], (list, tuple, np.ndarray)) \
                    else prow[1:]
                aoa.append(float(np.asarray(prow[0], float).reshape(-1)[0]))
                cdt.append(float(vals[0])); clt.append(float(vals[1]))
            break   # single-profile support (documented)
        if not aoa:   # flat-plate-ish default: cl = 0.1/deg, cd = 0.02
            aoa = [-90.0, 0.0, 90.0]
            cdt = [0.02, 0.02, 0.02]
            clt = [-2.0, 0.0, 2.0]
        order = np.argsort(aoa)
        aoa_tab = np.deg2rad(np.asarray(aoa, float)[order])
        cd_tab = np.asarray(cdt, float)[order]
        cl_tab = np.asarray(clt, float)[order]
        # per-cell static geometry
        c = np.asarray(mesh.c)
        v = np.asarray(mesh.v)
        rel = c - origin
        ax_comp = rel @ axis
        r_vec = rel - np.outer(ax_comp, axis)
        r_cell = np.linalg.norm(r_vec, axis=1)
        e_r = r_vec / np.maximum(r_cell, 1e-30)[:, None]
        e_t = np.cross(np.broadcast_to(axis, e_r.shape), e_r)
        r_min, r_max = float(rs.min()), float(rs.max())
        mnp = np.asarray(mask) * ((r_cell >= r_min)
                                  & (r_cell <= tip * r_max))
        twist_cell = np.deg2rad(np.interp(r_cell, rs, tws))
        chord_cell = np.interp(r_cell, rs, chs)
        vol_zone = float(np.sum(v * mnp))
        dz = max(vol_zone / max(np.pi * (r_max ** 2 - r_min ** 2),
                                1e-30), 1e-9)
        dens = n_blades / (2.0 * np.pi * np.maximum(r_cell, 1e-6) * dz)
        fields = tuple(str(f) for f in sub.get("fields", ["U"]))
        return Option(name, kind,
                      jnp.asarray(mnp, np.asarray(mesh.v).dtype),
                      fields or ("U",),
                      {"axis": axis, "origin": origin, "omega": omega,
                       "e_t": e_t, "r_cell": r_cell,
                       "twist_cell": twist_cell,
                       "chord_cell": chord_cell, "aoa_tab": aoa_tab,
                       "cl_tab": cl_tab, "cd_tab": cd_tab,
                       "dens": dens, "rhoRef": float(
                           sub.get("rhoRef", 1.0))})
    if kind in ("MRFSource", "MRF"):
        axis = _vec(sub.get("axis", (0.0, 0.0, 1.0)))
        axis = axis / max(np.linalg.norm(axis), 1e-30)
        om = float(sub.get("omega", 0.0))
        return Option(name, "MRFSource", mask, ("U",),
                      {"omega_vec": om * axis})
    raise ValueError(f"unknown fvOption type {kind!r}")


def from_dict(mesh, d: FoamDict, nu: float = 0.0) -> OptionList:
    opts = []
    for name, spec in d.items():
        if not isinstance(spec, FoamDict) or "type" not in spec:
            continue
        active = str(spec.get("active", "true")) in ("true", "yes", "on",
                                                     "1", "True")
        if not active:
            continue
        opts.append(_parse_option(mesh, str(name), spec, nu))
    return OptionList(opts)


def from_porous_zones(mesh, d: FoamDict, nu: float) -> List[Option]:
    """constant/porousZones (2.2 list of zone dicts with Darcy {d; f;})
    -> explicitPorositySource options (reference:
    src/finiteVolume/cfdTools/general/porousMedia/porousZone.C;
    coordinateSystem rotation APPLIED via coordinateRotation e1/e2/e3;
    cellZone selection replaced by selectionMode box/cylinder/all)."""
    opts: List[Option] = []

    def one(name, spec: FoamDict):
        sub = spec.get("Darcy", spec.get("DarcyForchheimerCoeffs", spec))
        dv = sub.get("d", (0.0, 0.0, 0.0))
        fv = sub.get("f", (0.0, 0.0, 0.0))
        if isinstance(dv, list) and dv and isinstance(
                dv[-1], (list, tuple, np.ndarray)):
            dv = dv[-1]   # dimensioned form: d d [dims] (..)
        if isinstance(fv, list) and fv and isinstance(
                fv[-1], (list, tuple, np.ndarray)):
            fv = fv[-1]
        sel = spec if "selectionMode" in spec else FoamDict(
            {"selectionMode": "all"})
        mask = _zone_mask(mesh, sel)
        R = _coord_rotation(spec)
        opts.append(Option(str(name), "explicitPorositySource", mask,
                           ("U",), {"d": _vec(dv), "f": _vec(fv),
                                    "nu": nu,
                                    "D": _rotated_tensor(_vec(dv), R),
                                    "F": _rotated_tensor(_vec(fv),
                                                         R)}))

    def walk(obj, name="porousZone"):
        if isinstance(obj, FoamDict):
            if "Darcy" in obj or "DarcyForchheimerCoeffs" in obj:
                one(name, obj)
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
    return opts


def from_case(case, nu: float = 0.0) -> Optional[OptionList]:
    """Read system/fvOptions or constant/fvOptions (reference lookup
    order), plus constant/porousZones (reference: porousSimpleFoam /
    rhoPorousSimpleFoam read porousZones directly)."""
    import os

    from ..core.dictionary import parse_file

    opts: List[Option] = []
    for cand in (case.sys_path("fvOptions"), case.const_path("fvOptions")):
        if os.path.exists(cand):
            opts += from_dict(case.mesh, parse_file(cand), nu).options
            break
    pz = case.const_path("porousZones")
    if os.path.exists(pz):
        opts += from_porous_zones(case.mesh, parse_file(pz), nu)
    return OptionList(opts) if opts else None
