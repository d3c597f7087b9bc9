"""BC factory: boundaryField dictionary entries -> PatchField.

The dictionary-keyword dispatch replacing the reference's run-time
selection tables (reference: fvPatchField::New +
addToRunTimeSelectionTable in src/finiteVolume/fields/fvPatchFields/).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from ..core.dictionary import FoamDict, Word
from .patchfields import PatchField, make


def parse_value(entry: Any, size: int, rank: int, dtype):
    """Parse `uniform v` / `uniform (x y z)` / `nonuniform List<..> N (..)`."""
    if entry is None:
        return None
    items = entry if isinstance(entry, list) else [entry]
    mode = None
    payload = None
    for x in items:
        if isinstance(x, (Word, str)) and str(x) in ("uniform", "nonuniform"):
            mode = str(x)
        elif isinstance(x, (int, float, np.ndarray)):
            payload = x
    if payload is None:
        return None
    arr = np.asarray(payload, dtype=np.float64)
    if mode == "uniform" or arr.ndim == 0 or (rank == 1 and arr.ndim == 1):
        if rank == 0:
            return jnp.asarray(np.full(size, float(arr)), dtype)
        return jnp.asarray(np.broadcast_to(arr.reshape(-1)[:3], (size, 3)), dtype)
    return jnp.asarray(arr, dtype)


# keyword aliases -> canonical kinds handled by patchfields
_ALIASES = {
    "noSlip": "fixedValue",
    "slip": "slip",
    "symmetry": "symmetry",
    "symmetryPlane": "symmetryPlane",
    "wedge": "wedge",
    "empty": "empty",
    "zeroGradient": "zeroGradient",
    "fixedValue": "fixedValue",
    "fixedGradient": "fixedGradient",
    # stress analysis: fixedGradient whose gradient the solid solver
    # recomputes each iteration from traction/pressure (reference:
    # solidDisplacementFoam tractionDisplacement BC)
    "tractionDisplacement": "fixedGradient",
    # conjugate-heat-transfer coupled interface: a mixed BC whose
    # refValue/valueFraction the chtMultiRegion driver refreshes from
    # the neighbouring region each iteration
    "compressible::turbulentTemperatureCoupledBaffleMixed": "mixed",
    "turbulentTemperatureCoupledBaffleMixed": "mixed",
    "solidWallMixedTemperatureCoupled": "mixed",
    "mixed": "mixed",
    "calculated": "calculated",
    "inletOutlet": "inletOutlet",
    "outletInlet": "outletInlet",
    "totalPressure": "totalPressure",
    "pressureInletOutletVelocity": "pressureInletOutletVelocity",
    "freestream": "freestream",
    "freestreamPressure": "zeroGradient",
    "movingWallVelocity": "fixedValue",
    "kqRWallFunction": "kqRWallFunction",
    "nutkWallFunction": "nutkWallFunction",
    "nutUWallFunction": "nutUWallFunction",
    "epsilonWallFunction": "epsilonWallFunction",
    "omegaWallFunction": "omegaWallFunction",
    "kLowReWallFunction": "kLowReWallFunction",
    "turbulentIntensityKineticEnergyInlet": "turbulentIntensityKineticEnergyInlet",
    "turbulentMixingLengthDissipationRateInlet": "turbulentMixingLengthDissipationRateInlet",
    "turbulentMixingLengthFrequencyInlet": "turbulentMixingLengthFrequencyInlet",
    "surfaceNormalFixedValue": "surfaceNormalFixedValue",
    "flowRateInletVelocity": "flowRateInletVelocity",
    "fixedFluxPressure": "fixedFluxPressure",
    "waveTransmissive": "waveTransmissive",
    "pressureInletVelocity": "pressureInletVelocity",
    "rotatingWallVelocity": "rotatingWallVelocity",
    "supersonicFreestream": "supersonicFreestream",
    "variableHeightFlowRate": "variableHeightFlowRate",
    "cyclicAMI": "cyclicAMI",
    "cylindricalInletVelocity": "cylindricalInletVelocity",
    "swirlFlowRateInletVelocity": "swirlFlowRateInletVelocity",
    "uniformFixedValue": "uniformFixedValue",
    "oscillatingFixedValue": "oscillatingFixedValue",
    # fluxCorrectedVelocity: zeroGradient + normal flux correction —
    # same closure as pressureInletOutletVelocity (documented mapping)
    "fluxCorrectedVelocity": "pressureInletOutletVelocity",
    "externalWallHeatFluxTemperature": "externalWallHeatFluxTemperature",
    "pressureDirectedInletVelocity": "pressureDirectedInletVelocity",
    # totalTemperature: reservoir temperature at inflow (static
    # T = T0 approximation of the compressible total-T relation —
    # documented deviation; exact for low-Mach inlets)
    "totalTemperature": "totalTemperature",
    # potentialFreeSurfaceFoam: dynamic surface-elevation pressure —
    # mapped to mixed; the solver rewrites ref_value from zeta each
    # step (solvers/potentialfreesurface.py)
    "waveSurfacePressure": "mixed",
}


def _coded_value(spec: FoamDict, patch, rank: int, dtype, mesh):
    """codedFixedValue / dynamicCode analogue (reference:
    src/OpenFOAM/db/dynamicLibrary/codedBase + codedFixedValue BC).
    The reference compiles a C++ snippet at run time; the TPU rebuild
    executes a PYTHON snippet from the `code` entry with the namespace
      np, jnp, Cf [n,3] face centres, normal [n,3] outward unit
      normals, t (start time) — and takes `value` as the result.
    Evaluated ONCE at field-read time (static BC data; time-varying
    coded BCs are not supported yet)."""
    import numpy as _np

    code = spec.get("code")
    if code is None:
        return None
    src = str(code)
    sl = patch.slice
    cf = _np.asarray(mesh.cf)[sl]
    sf = _np.asarray(mesh.sf)[sl]
    nrm = sf / _np.maximum(
        _np.linalg.norm(sf, axis=1, keepdims=True), 1e-30)
    ns = {"np": _np, "jnp": jnp, "Cf": cf, "normal": nrm,
          "t": 0.0, "value": None}
    exec(compile(src, "<codedFixedValue>", "exec"), ns)  # noqa: S102
    val = ns.get("value")
    if val is None:
        raise ValueError("codedFixedValue code must assign `value`")
    val = _np.asarray(val, dtype=float)
    want = (patch.size, 3) if rank == 1 else (patch.size,)
    val = _np.broadcast_to(val, want)
    return jnp.asarray(val, dtype)


def from_dict(spec: FoamDict, patch, rank: int, dtype,
              mesh=None) -> PatchField:
    t = str(spec["type"])
    # compressible:: namespace prefix (reference: the compressible
    # turbulence/thermo BC twins) resolves to the shared kinds
    if t.startswith("compressible::"):
        t = t[len("compressible::"):]
    # mut* are the compressible names of the nut* wall functions
    t = {"mutkWallFunction": "nutkWallFunction",
         "mutUWallFunction": "nutUWallFunction",
         "mutLowReWallFunction": "nutkWallFunction",
         "alphatWallFunction": "calculated",
         "alphatJayatillekeWallFunction": "calculated"}.get(t, t)
    if t in ("codedFixedValue", "codedMixed") and mesh is not None:
        cv = _coded_value(spec, patch, rank, dtype, mesh)
        if cv is not None:
            return make("fixedValue", ref_value=cv, vfrac=1.0)
    kind = _ALIASES.get(t)
    if kind is None:
        # unknown derived BC: degrade to calculated with stored value
        # (the genericPatchField strategy, reference: src/genericPatchFields/)
        kind = "calculated" if "value" in spec else "zeroGradient"
    size = patch.size

    val = parse_value(spec.get("value"), size, rank, dtype)
    grad = parse_value(spec.get("gradient"), size, rank, dtype)

    kw = {}
    if kind in ("fixedValue", "calculated", "nutkWallFunction", "nutUWallFunction",
                "epsilonWallFunction", "omegaWallFunction", "kLowReWallFunction",
                "surfaceNormalFixedValue", "flowRateInletVelocity"):
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
    elif kind == "fixedGradient":
        kw["ref_grad"] = grad if grad is not None else 0.0
        kw["vfrac"] = 0.0
    elif kind == "mixed":
        rv = parse_value(spec.get("refValue"), size, rank, dtype)
        rg = parse_value(spec.get("refGradient"), size, rank, dtype)
        vf = parse_value(spec.get("valueFraction"), size, 0, dtype)
        kw["ref_value"] = rv if rv is not None else 0.0
        kw["ref_grad"] = rg if rg is not None else 0.0
        kw["vfrac"] = vf if vf is not None else 1.0
    elif kind in ("inletOutlet", "outletInlet"):
        iv = parse_value(spec.get("inletValue" if kind == "inletOutlet"
                                  else "outletValue"), size, rank, dtype)
        kw["ref_value"] = iv if iv is not None else 0.0
        kw["vfrac"] = 1.0
    elif kind == "totalPressure":
        p0 = parse_value(spec.get("p0"), size, 0, dtype)
        kw["ref_value"] = p0 if p0 is not None else 0.0
        kw["p0"] = float(np.asarray(p0).mean()) if p0 is not None else 0.0
        kw["vfrac"] = 1.0
    elif kind == "turbulentIntensityKineticEnergyInlet":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        kw["intensity"] = float(spec.get("intensity", 0.05))
    elif kind in ("turbulentMixingLengthDissipationRateInlet",
                  "turbulentMixingLengthFrequencyInlet"):
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        kw["mixingLength"] = float(spec.get("mixingLength", 0.001))
    elif kind == "fixedFluxPressure":
        kw["ref_grad"] = grad if grad is not None else 0.0
        kw["vfrac"] = 0.0
    elif kind == "waveTransmissive":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 0.0
        fi = spec.get("fieldInf")
        if fi is not None:
            kw["fieldInf"] = float(np.asarray(fi).reshape(-1)[-1]) \
                if not isinstance(fi, (list, tuple)) else float(fi[-1])
        kw["lInf"] = float(spec.get("lInf", 0.0))
    elif kind == "pressureInletVelocity":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
    elif kind == "rotatingWallVelocity":
        # static: U = omega x (Cf - origin) (reference:
        # rotatingWallVelocityFvPatchVectorField)
        origin = np.asarray(spec.get("origin", (0.0, 0.0, 0.0)),
                            dtype=float).reshape(3)
        axis = np.asarray(spec.get("axis", (0.0, 0.0, 1.0)),
                          dtype=float).reshape(3)
        axis = axis / max(np.linalg.norm(axis), 1e-30)
        om = spec.get("omega", 0.0)
        if isinstance(om, (list, tuple)):
            om = om[-1]
        if mesh is not None:
            cf = np.asarray(mesh.cf)[patch.slice]
            u = np.cross(float(om) * axis, cf - origin)
            kw["ref_value"] = jnp.asarray(u, dtype)
        else:
            kw["ref_value"] = 0.0
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind == "supersonicFreestream":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 0.0
    elif kind == "variableHeightFlowRate":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 0.0
        kw["lowerBound"] = float(spec.get("lowerBound", 0.0))
        kw["upperBound"] = float(spec.get("upperBound", 1.0))
    elif kind == "cyclicAMI":
        kw["vfrac"] = 0.0
    elif kind == "cylindricalInletVelocity":
        # U = Ua a + Ur r^ + (rpm 2pi/60)(a x r) (reference:
        # fvPatchFields/derived/cylindricalInletVelocity/) — static
        # geometry-derived fixedValue
        origin = np.asarray(spec.get("centre",
                                     spec.get("origin", (0, 0, 0))),
                            dtype=float).reshape(3)
        axis = np.asarray(spec.get("axis", (0, 0, 1)),
                          dtype=float).reshape(3)
        axis = axis / max(np.linalg.norm(axis), 1e-30)
        ua = _num(spec.get("axialVelocity", 0.0))
        ur = _num(spec.get("radialVelocity", 0.0))
        rpm = _num(spec.get("rpm", 0.0))
        if mesh is not None:
            cf = np.asarray(mesh.cf)[patch.slice]
            d = cf - origin
            d = d - np.outer(d @ axis, axis)
            r = np.linalg.norm(d, axis=1, keepdims=True)
            rhat = d / np.maximum(r, 1e-30)
            u = (ua * axis[None, :] + ur * rhat
                 + rpm * np.pi / 30.0 * np.cross(axis[None, :], d))
            kw["ref_value"] = jnp.asarray(u, dtype)
        else:
            kw["ref_value"] = 0.0
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind == "swirlFlowRateInletVelocity":
        # normal velocity from flowRate/patch area + rpm swirl
        # (reference: derived/swirlFlowRateInletVelocity/)
        origin = np.asarray(spec.get("origin", (0, 0, 0)),
                            dtype=float).reshape(3)
        axis = np.asarray(spec.get("axis", (0, 0, 1)),
                          dtype=float).reshape(3)
        axis = axis / max(np.linalg.norm(axis), 1e-30)
        qdot = _num(spec.get("flowRate", 0.0))
        rpm = _num(spec.get("rpm", 0.0))
        if mesh is not None:
            sl = patch.slice
            sf = np.asarray(mesh.sf)[sl]
            area = float(np.linalg.norm(sf, axis=1).sum())
            nrm = sf / np.maximum(
                np.linalg.norm(sf, axis=1, keepdims=True), 1e-30)
            cf = np.asarray(mesh.cf)[sl]
            d = cf - origin
            d = d - np.outer(d @ axis, axis)
            u = (-qdot / max(area, 1e-30) * nrm
                 + rpm * np.pi / 30.0 * np.cross(axis[None, :], d))
            kw["ref_value"] = jnp.asarray(u, dtype)
        else:
            kw["ref_value"] = 0.0
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind == "uniformFixedValue":
        # constant or table form, evaluated at the start time (static
        # — time-varying tables are sampled at t=0; documented)
        uv = spec.get("uniformValue")
        kw["ref_value"] = _uniform_entry(uv, size, rank, dtype, val)
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind == "oscillatingFixedValue":
        # refValue (1 + amplitude sin(2 pi f t)) at t=0 -> refValue
        rv = parse_value(spec.get("refValue"), size, rank, dtype)
        kw["ref_value"] = rv if rv is not None else (
            val if val is not None else 0.0)
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind == "externalWallHeatFluxTemperature":
        # q-mode: fixedGradient q/kappa; h-mode: Robin (mixed) with
        # vfrac = h/(h + kappa dc) per face (reference:
        # derived/externalWallHeatFluxTemperature/; kappa is a plain
        # dictionary value here instead of a thermo lookup)
        kappa = _num(spec.get("kappaValue", spec.get("kappa", 1.0)))
        kappa = max(kappa, 1e-30)
        if "q" in spec:
            kw["ref_grad"] = _num(spec.get("q", 0.0)) / kappa
            kw["vfrac"] = 0.0
            kind = "fixedGradient"
        else:
            h = _num(spec.get("h", 0.0))
            Ta = _num(spec.get("Ta", 300.0))
            if mesh is not None:
                dc = np.asarray(mesh.delta_coeffs)[patch.slice]
                f = h / (h + kappa * np.maximum(dc, 1e-30))
                kw["vfrac"] = jnp.asarray(f, dtype)
            else:
                kw["vfrac"] = 1.0
            kw["ref_value"] = Ta
            kw["ref_grad"] = 0.0
            kind = "mixed"
    elif kind == "pressureDirectedInletVelocity":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        d = np.asarray(spec.get("inletDirection", [(1.0, 0.0, 0.0)]),
                       dtype=float).reshape(-1)[-3:]
        kw["inletDir"] = tuple(float(x) for x in d)
    elif kind == "totalTemperature":
        t0 = parse_value(spec.get("T0"), size, 0, dtype)
        kw["ref_value"] = t0 if t0 is not None else (
            val if val is not None else 300.0)
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    return make(kind, **kw)


def _num(x) -> float:
    """Last numeric token of a possibly dimensioned entry."""
    if isinstance(x, (list, tuple)):
        x = x[-1]
    return float(np.asarray(x, dtype=float).reshape(-1)[-1])


def _uniform_entry(uv, size, rank, dtype, fallback):
    """uniformValue: bare number/vector, `constant v`, or
    `table ((t0 v0) (t1 v1) ...)` sampled at t=0."""
    if uv is None:
        return fallback if fallback is not None else 0.0
    items = uv if isinstance(uv, list) else [uv]
    words = [str(x) for x in items if isinstance(x, (Word, str))]
    nums = [x for x in items if isinstance(x, (int, float, np.ndarray))]
    if "table" in words and nums:
        rows = np.asarray(nums[-1], dtype=float)
        rows = rows.reshape(-1, rows.shape[-1]) if rows.ndim > 1 \
            else rows.reshape(1, -1)
        first = rows[0]
        v = first[1:] if first.shape[0] > 1 else first
        if rank == 1:
            return jnp.asarray(np.broadcast_to(v[-3:], (size, 3)),
                               dtype)
        return jnp.asarray(np.full(size, float(v[-1])), dtype)
    if nums:
        v = np.asarray(nums[-1], dtype=float).reshape(-1)
        if rank == 1:
            return jnp.asarray(np.broadcast_to(v[-3:], (size, 3)),
                               dtype)
        return jnp.asarray(np.full(size, float(v[-1])), dtype)
    return fallback if fallback is not None else 0.0
