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
    # freestreamPressure: zeroGradient on outflow, freestream value on
    # inflow (reference: derived/freestreamPressure/) — the inletOutlet
    # closure with inletValue = the stored value
    "freestreamPressure": "inletOutlet",
    "partialSlip": "partialSlip",
    "fixedNormalSlip": "fixedNormalSlip",
    "translatingWallVelocity": "translatingWallVelocity",
    "uniformTotalPressure": "uniformTotalPressure",
    "inletOutletTotalTemperature": "inletOutletTotalTemperature",
    "outletMappedUniformInlet": "outletMappedUniformInlet",
    "turbulentInlet": "turbulentInlet",
    "atmBoundaryLayerInletVelocity": "atmBoundaryLayerInletVelocity",
    "atmBoundaryLayerInletEpsilon": "atmBoundaryLayerInletEpsilon",
    "nutUSpaldingWallFunction": "nutUSpaldingWallFunction",
    "nutkRoughWallFunction": "nutkRoughWallFunction",
    "nutURoughWallFunction": "nutUSpaldingWallFunction",
    "rotatingPressureInletOutletVelocity":
        "rotatingPressureInletOutletVelocity",
    "rotatingTotalPressure": "rotatingTotalPressure",
    "alphatJayatillekeWallFunction": "alphatJayatillekeWallFunction",
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
    # plain cyclic on a RETAINED pair (one whose partner field carries
    # a jump BC): continuity rides the identity-AMI coupling; fully
    # internalised cyclic pairs never reach the factory
    "cyclic": "cyclicAMI",
    # jumpCyclic family on retained (createBaffles-style coincident)
    # cyclic pairs (reference: fvPatchFields/derived/{fixedJump,fan})
    "fixedJump": "fixedJump",
    "fixedJumpAMI": "fixedJump",
    "fan": "fan",
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
    # batch 3 (bc/derived3.py)
    "advective": "advective",
    "uniformFixedGradient": "uniformFixedGradient",
    "pressureInletUniformVelocity": "pressureInletUniformVelocity",
    "pressureNormalInletOutletVelocity":
        "pressureNormalInletOutletVelocity",
    "variableHeightFlowRateInletVelocity":
        "variableHeightFlowRateInletVelocity",
    "fixedShearStress": "fixedShearStress",
    "buoyantPressure": "buoyantPressure",
    "uniformDensityHydrostaticPressure":
        "uniformDensityHydrostaticPressure",
    "turbulentHeatFluxTemperature": "turbulentHeatFluxTemperature",
    "fixedPressureCompressibleDensity":
        "fixedPressureCompressibleDensity",
    # fixedInternalValue: zeroGradient facade; the internal-cell
    # forcing is a solver setValues concern in this framework
    # (reference: fvPatchFields/basic/fixedInternalValue/)
    "fixedInternalValue": "zeroGradient",
    "timeVaryingMappedFixedValue": "timeVaryingMappedFixedValue",
    # batch 4 (bc/derived4.py)
    "constantAlphaContactAngle": "alphaContactAngle",
    "dynamicAlphaContactAngle": "alphaContactAngle",
    "maxwellSlipU": "maxwellSlipU",
    "smoluchowskiJumpT": "smoluchowskiJumpT",
    "fixedRho": "fixedRho",
    "fanPressure": "fanPressure",
    "syringePressure": "syringePressure",
    "pressureInletOutletParSlipVelocity":
        "pressureInletOutletParSlipVelocity",
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
              mesh=None, case_dir=None, field_name=None) -> PatchField:
    t = str(spec["type"])
    # compressible:: namespace prefix (reference: the compressible
    # turbulence/thermo BC twins) resolves to the shared kinds
    if t.startswith("compressible::"):
        t = t[len("compressible::"):]
    # nut/mutLowReWallFunction: the reference sets nut = 0 at the wall
    # (wall-resolved low-Re meshes); the log-law nutk value would
    # silently inject wall viscosity (ADVICE r3 #1)
    if t in ("nutLowReWallFunction", "mutLowReWallFunction"):
        return make("fixedValue", ref_value=0.0, vfrac=1.0)
    # mut* are the compressible names of the nut* wall functions
    t = {"mutkWallFunction": "nutkWallFunction",
         "mutUWallFunction": "nutUWallFunction",
         "mutkRoughWallFunction": "nutkRoughWallFunction",
         "mutUSpaldingWallFunction": "nutUSpaldingWallFunction",
         "alphatWallFunction": "calculated"}.get(t, t)
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
        if iv is None:  # freestreamPressure alias: freestreamValue/value
            iv = parse_value(spec.get("freestreamValue"), size, rank,
                             dtype)
        if iv is None:
            iv = val
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
    elif kind in ("fixedJump", "fan"):
        kw["vfrac"] = 0.0
        # master side: the pair member listed first in the boundary
        # (reference: jumpCyclic applies +jump on the owner patch)
        master = True
        if mesh is not None and getattr(patch, "neighbour_patch", None):
            names = [p.name for p in mesh.patches]
            try:
                master = names.index(patch.name) < names.index(
                    patch.neighbour_patch)
            except ValueError:
                pass
        kw["master"] = master
        if kind == "fixedJump":
            jv = parse_value(spec.get("jump"), size, rank, dtype)
            kw["ref_value"] = jv if jv is not None else 0.0
        else:
            # 2.2 fan curve: `f (c0 c1 ...)` polynomial in the
            # volumetric flow rate (reference: fan::calcFanJump)
            fco = spec.get("f", spec.get("fanCoeffs"))
            if fco is not None:
                kw["fanPoly"] = tuple(
                    float(x) for x in np.asarray(fco, float).reshape(-1))
            kw["ref_value"] = 0.0
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
        # constant or `table ((t v) ...)` form; tables become the
        # dynamic kind re-sampled from the solver time each step
        # (reference: uniformFixedValueFvPatchField + DataEntry)
        uv = spec.get("uniformValue")
        kw["ref_value"] = _uniform_entry(uv, size, rank, dtype, val)
        kw["vfrac"] = 1.0
        tbl = _table_rows(uv, rank)
        if tbl is not None:
            kw["table"] = tbl
            kind = "uniformFixedValueT"
        else:
            kind = "fixedValue"
    elif kind == "oscillatingFixedValue":
        # refValue (1 + amplitude sin(2 pi f t)), dynamic via the t
        # context (reference: derived/oscillatingFixedValue/)
        rv = parse_value(spec.get("refValue"), size, rank, dtype)
        rv = rv if rv is not None else (val if val is not None else 0.0)
        kw["ref_value"] = rv
        kw["ref_grad"] = rv
        kw["amplitude"] = _num(spec.get("amplitude", 0.0))
        kw["frequency"] = _num(spec.get("frequency", 0.0))
        kw["vfrac"] = 1.0
        kind = "oscillatingFixedValueT"
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
    elif kind == "partialSlip":
        vf = parse_value(spec.get("valueFraction"), size, 0, dtype)
        kw["vfrac"] = vf if vf is not None else 0.5
    elif kind == "fixedNormalSlip":
        fv = parse_value(spec.get("fixedValue"), size, rank, dtype)
        kw["ref_value"] = fv if fv is not None else (
            val if val is not None else 0.0)
    elif kind == "translatingWallVelocity":
        # U = U0 - n (n.U0) (reference: derived/translatingWallVelocity/)
        u0 = np.asarray(spec.get("U", (0.0, 0.0, 0.0)),
                        dtype=float).reshape(-1)[-3:]
        if mesh is not None:
            sf = np.asarray(mesh.sf)[patch.slice]
            nrm = sf / np.maximum(
                np.linalg.norm(sf, axis=1, keepdims=True), 1e-30)
            u = u0[None, :] - nrm * (nrm @ u0)[:, None]
            kw["ref_value"] = jnp.asarray(u, dtype)
        else:
            kw["ref_value"] = jnp.asarray(np.broadcast_to(u0, (size, 3)),
                                          dtype)
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind == "uniformTotalPressure":
        # p0 from a constant/table entry sampled at t=0, then the
        # dynamic totalPressure closure (reference:
        # derived/uniformTotalPressure/)
        p0e = _uniform_entry(spec.get("p0", spec.get("pressure")),
                             size, 0, dtype, val)
        kw["ref_value"] = p0e
        kw["p0"] = float(np.asarray(p0e).mean())
        kw["vfrac"] = 1.0
        kind = "totalPressure"
    elif kind == "inletOutletTotalTemperature":
        t0 = parse_value(spec.get("T0"), size, 0, dtype)
        kw["ref_grad"] = t0 if t0 is not None else (
            val if val is not None else 300.0)
        kw["ref_value"] = kw["ref_grad"]
        kw["vfrac"] = 0.0
        kw["Cp"] = _num(spec.get("Cp", 1005.0))
    elif kind == "outletMappedUniformInlet":
        out_name = str(spec.get("outletPatchName",
                                spec.get("outletPatch", "")))
        kw["fraction"] = _num(spec.get("fraction", 1.0))
        kw["out_start"], kw["out_size"] = -1, 0
        if mesh is not None:
            for op in mesh.patches:
                if op.name == out_name:
                    kw["out_start"], kw["out_size"] = op.start, op.size
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
    elif kind == "turbulentInlet":
        ref = parse_value(spec.get("referenceField"), size, rank, dtype)
        kw["ref_grad"] = ref if ref is not None else (
            val if val is not None else 0.0)
        kw["ref_value"] = kw["ref_grad"]
        fs = spec.get("fluctuationScale", 0.0)
        fsv = np.asarray(fs, dtype=float).reshape(-1)
        kw["fluctuationScale"] = tuple(float(x) for x in fsv) \
            if rank == 1 else float(fsv[-1])
        kw["vfrac"] = 1.0
    elif kind in ("atmBoundaryLayerInletVelocity",
                  "atmBoundaryLayerInletEpsilon"):
        # log-law atmospheric boundary layer profiles (reference:
        # derived/atmBoundaryLayerInletVelocity/): Ustar = kappa Uref /
        # ln((Href+z0)/z0); U = Ustar/kappa ln((z-zg+z0)/z0) flowDir;
        # epsilon = Ustar^3 / (kappa (z-zg+z0))
        kappa_c = _num(spec.get("kappa", 0.41))
        z0 = max(_num(spec.get("z0", 0.1)), 1e-6)
        uref = _num(spec.get("Uref", 10.0))
        href = max(_num(spec.get("Href", spec.get("Zref", 10.0))), z0)
        zg = _num(spec.get("zGround", 0.0))
        zdir = np.asarray(spec.get("zDir", spec.get("z", (0, 0, 1))),
                          dtype=float).reshape(-1)[-3:]
        zdir = zdir / max(np.linalg.norm(zdir), 1e-30)
        ustar = kappa_c * uref / np.log((href + z0) / z0)
        if mesh is not None:
            z = np.asarray(mesh.cf)[patch.slice] @ zdir - zg
            prof = np.log(np.maximum(z + z0, z0) / z0)
            if kind == "atmBoundaryLayerInletVelocity":
                fdir = np.asarray(
                    spec.get("flowDir", spec.get("n", (1, 0, 0))),
                    dtype=float).reshape(-1)[-3:]
                fdir = fdir / max(np.linalg.norm(fdir), 1e-30)
                u = (ustar / kappa_c) * prof[:, None] * fdir[None, :]
                kw["ref_value"] = jnp.asarray(u, dtype)
            else:
                eps = ustar ** 3 / (kappa_c * np.maximum(z + z0, z0))
                kw["ref_value"] = jnp.asarray(eps, dtype)
        else:
            kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind in ("nutUSpaldingWallFunction", "nutkRoughWallFunction"):
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        if kind == "nutkRoughWallFunction":
            kw["Ks"] = _num(spec.get("Ks", 0.0))
            kw["Cs"] = _num(spec.get("Cs", 0.5))
    elif kind == "alphatJayatillekeWallFunction":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        kw["Prt"] = _num(spec.get("Prt", 0.85))
        kw["Pr"] = _num(spec.get("Pr", 0.7))
    elif kind in ("rotatingPressureInletOutletVelocity",
                  "rotatingTotalPressure"):
        origin = np.asarray(spec.get("origin", (0.0, 0.0, 0.0)),
                            dtype=float).reshape(-1)[-3:]
        axis = np.asarray(spec.get("axis", (0.0, 0.0, 1.0)),
                          dtype=float).reshape(-1)[-3:]
        axis = axis / max(np.linalg.norm(axis), 1e-30)
        om = _num(spec.get("omega", 0.0))
        if mesh is not None:
            cf = np.asarray(mesh.cf)[patch.slice]
            omxr = np.cross(om * axis, cf - origin)
        else:
            omxr = np.zeros((size, 3))
        if kind == "rotatingPressureInletOutletVelocity":
            kw["ref_grad"] = jnp.asarray(-omxr, dtype)
            kw["ref_value"] = val if val is not None else 0.0
        else:
            p0 = parse_value(spec.get("p0"), size, 0, dtype)
            p0a = p0 if p0 is not None else jnp.zeros(size, dtype)
            kw["ref_grad"] = p0a - 0.5 * jnp.asarray(
                np.sum(omxr * omxr, axis=1), dtype)
            kw["ref_value"] = kw["ref_grad"]
        kw["vfrac"] = 1.0
    elif kind == "totalTemperature":
        t0 = parse_value(spec.get("T0"), size, 0, dtype)
        kw["ref_value"] = t0 if t0 is not None else (
            val if val is not None else 300.0)
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind == "advective":
        # material-speed outflow (reference: derived/advective/)
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 0.0
        fi = spec.get("fieldInf")
        if fi is not None:
            kw["fieldInf"] = float(np.asarray(fi).reshape(-1)[-1]) \
                if not isinstance(fi, (list, tuple)) else float(fi[-1])
        kw["lInf"] = _num(spec.get("lInf", 0.0))
    elif kind == "uniformFixedGradient":
        ug = spec.get("uniformGradient")
        kw["ref_grad"] = _uniform_entry(ug, size, rank, dtype, grad)
        kw["vfrac"] = 0.0
        tbl = _table_rows(ug, rank)
        if tbl is not None:
            kw["table"] = tbl
            kind = "uniformFixedGradientT"
        else:
            kind = "fixedGradient"
    elif kind in ("pressureInletUniformVelocity",
                  "pressureNormalInletOutletVelocity"):
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0 if kind == "pressureInletUniformVelocity" \
            else 0.0
    elif kind == "variableHeightFlowRateInletVelocity":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        kw["flowRate"] = _num(spec.get("flowRate", 0.0))
    elif kind == "fixedShearStress":
        tau = np.asarray(spec.get("tau", (0.0, 0.0, 0.0)),
                         dtype=float).reshape(-1)[-3:]
        kw["tau"] = tuple(float(x) for x in tau)
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
    elif kind == "buoyantPressure":
        kw["ref_grad"] = grad if grad is not None else 0.0
        kw["vfrac"] = 0.0
        kw["rho"] = _num(spec.get("rho", 1.0)) \
            if not isinstance(spec.get("rho"), (str, Word)) else 1.0
    elif kind == "uniformDensityHydrostaticPressure":
        # static: p = pRefValue + rho g.(Cf - pRefPoint) (reference:
        # derived/uniformDensityHydrostaticPressure/; g comes from an
        # optional `g` entry, default earth gravity -z — the reference
        # reads the registered uniformDimensionedField)
        rho0 = _num(spec.get("rho", spec.get("rhoRef", 1000.0)))
        pref = _num(spec.get("pRefValue", 0.0))
        prp = np.asarray(spec.get("pRefPoint", (0.0, 0.0, 0.0)),
                         dtype=float).reshape(-1)[-3:]
        gv = np.asarray(spec.get("g", (0.0, 0.0, -9.81)),
                        dtype=float).reshape(-1)[-3:]
        if mesh is not None:
            cf = np.asarray(mesh.cf)[patch.slice]
            p_face = pref + rho0 * (cf - prp) @ gv
            kw["ref_value"] = jnp.asarray(p_face, dtype)
        else:
            kw["ref_value"] = pref
        kw["vfrac"] = 1.0
        kind = "fixedValue"
    elif kind == "turbulentHeatFluxTemperature":
        kw["ref_grad"] = grad if grad is not None else 0.0
        kw["vfrac"] = 0.0
        kw["heatSource"] = str(spec.get("heatSource", "flux"))
        kw["q"] = _num(spec.get("q", 0.0))
        kw["alphaEff"] = _num(spec.get("alphaEff",
                                       spec.get("kappa", 2e-5)))
        kw["rho"] = _num(spec.get("rho", 1.2))
        kw["Cp"] = _num(spec.get("Cp", 1005.0))
    elif kind == "fixedPressureCompressibleDensity":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        kw["p0"] = _num(spec.get("p0", 0.0))
        kw["rho0"] = _num(spec.get("rho0", 1000.0))
        kw["psi"] = _num(spec.get("psi", 1e-5))
    elif kind == "timeVaryingMappedFixedValue":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        fname = str(spec.get("fieldTableName", field_name or ""))
        if case_dir is not None and mesh is not None and fname:
            from .derived3 import _Frozen, load_boundary_data

            cf = np.asarray(mesh.cf)[patch.slice]
            tbl = load_boundary_data(case_dir, patch.name, fname, cf)
            if tbl is not None:
                kw["tvm"] = _Frozen(tbl)
                # seed the value at the first snapshot
                kw["ref_value"] = jnp.asarray(tbl[1][0], dtype)
        if "tvm" not in kw:
            kind = "fixedValue"   # no boundaryData found: hold `value`
    elif kind == "alphaContactAngle":
        # zeroGradient facade carrying the contact angle for
        # interfaceProperties (models/interface.py); theta in RADIANS
        kw["ref_grad"] = 0.0
        kw["vfrac"] = 0.0
        kw["theta0"] = float(np.radians(_num(spec.get("theta0", 90.0))))
        for k in ("uTheta", "thetaA", "thetaR"):
            if k in spec:
                kw[k] = float(np.radians(_num(spec[k]))) \
                    if k != "uTheta" else _num(spec[k])
    elif kind in ("maxwellSlipU", "smoluchowskiJumpT"):
        kw["ref_value"] = val if val is not None else (
            0.0 if kind == "maxwellSlipU" else 300.0)
        kw["vfrac"] = 1.0
        kw["accommodationCoeff"] = _num(
            spec.get("accommodationCoeff", 1.0))
        if "lambda" in spec:
            kw["lambda"] = _num(spec["lambda"])
        if kind == "maxwellSlipU":
            uw = spec.get("Uwall", (0.0, 0.0, 0.0))
            kw["Uwall"] = tuple(float(x) for x in np.asarray(
                uw, dtype=float).reshape(-1)[-3:])
        else:
            kw["Twall"] = _num(spec.get("Twall", 300.0))
            kw["gamma"] = _num(spec.get("gamma", 1.4))
            kw["Pr"] = _num(spec.get("Pr", 0.72))
    elif kind == "fixedRho":
        kw["ref_value"] = val if val is not None else 1.0
        kw["vfrac"] = 1.0
        if "psi" in spec:
            kw["psi"] = _num(spec["psi"])
    elif kind == "fanPressure":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        kw["p0"] = _num(spec.get("p0", 0.0))
        kw["direction"] = str(spec.get("direction", "in"))
        fc = spec.get("fanCurve", spec.get("jumpTable"))
        rows = _table_rows(fc, 0) if fc is not None else None
        if rows is not None:
            from .derived3 import _Frozen

            kw["fanCurve"] = _Frozen(np.asarray(
                [(t, v) for t, v in rows], dtype=float))
    elif kind == "syringePressure":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 1.0
        for k in ("Ap", "Sp", "VsI", "tas", "tae", "tds", "tde",
                  "psI", "psE", "ams"):
            if k in spec:
                kw[k] = _num(spec[k])
    elif kind == "pressureInletOutletParSlipVelocity":
        kw["ref_value"] = val if val is not None else 0.0
        kw["vfrac"] = 0.0
    return make(kind, **kw)


def _table_rows(uv, rank: int):
    """Extract `table ((t0 v0) (t1 v1) ...)` rows as a hashable tuple
    ((t, v), ...) for the dynamic uniformFixedValue update (scalar v,
    or tuple v for vectors)."""
    if uv is None:
        return None
    items = uv if isinstance(uv, list) else [uv]
    words = [str(x) for x in items if isinstance(x, (Word, str))]
    nums = [x for x in items if isinstance(x, (int, float, np.ndarray))]
    if "table" not in words or not nums:
        return None
    rows = np.asarray(nums[-1], dtype=float)
    rows = rows.reshape(-1, rows.shape[-1]) if rows.ndim > 1 \
        else rows.reshape(1, -1)
    if rows.shape[0] < 2:
        return None
    out = []
    for r in rows:
        t = float(r[0])
        v = tuple(float(x) for x in r[1:]) if rank == 1 else float(r[-1])
        out.append((t, v))
    return tuple(out)


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
