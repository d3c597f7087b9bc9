"""preputils — preProcessing + equilibrium-thermo utilities, batch 5.

Rebuilds of reference utilities:
  applications/utilities/preProcessing/
    {applyWallFunctionBoundaryConditions,wallFunctionTable,
     faceAgglomerate,viewFactorsGen}
  applications/utilities/postProcessing/turbulence/
    createTurbulenceFields
  applications/utilities/thermophysical/{equilibriumFlameT,
    equilibriumCO}

The equilibrium pair share one Gibbs-based Kp(T) evaluated from the
same janaf coefficients the rest of the thermo stack uses
(specieThermo::Kp in the reference = exp(-dG0/(R T)) with 1 atm
reference pressure).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

from ..core.dictionary import FoamDict, parse_file, write_file
from .thermoutils import R_UNIV, _janaf_h, _species_from_dict, mixture_h

P_ATM = 101325.0

# ---------------------------------------------------------------------------
# wall-function boundary conditions
# ---------------------------------------------------------------------------

_WALL_FN = {
    "k": "kqRWallFunction",
    "q": "kqRWallFunction",
    "R": "kqRWallFunction",
    "epsilon": "epsilonWallFunction",
    "omega": "omegaWallFunction",
    "nut": "nutkWallFunction",
    "mut": "mutkWallFunction",
    "nuTilda": "zeroGradient",
    "nuSgs": "zeroGradient",
    "alphat": "alphatWallFunction",
}


def apply_wall_function_bcs_cmd(argv) -> int:
    """applyWallFunctionBoundaryConditions: rewrite the wall-patch BC
    types of the turbulence fields to their wall functions (reference:
    .../preProcessing/applyWallFunctionBoundaryConditions/)."""
    ap = argparse.ArgumentParser(prog="applyWallFunctionBCs")
    ap.add_argument("-case", default=".")
    ap.add_argument("-time", default="0")
    a = ap.parse_args(argv)
    from ..io import polymesh as mesh_io

    pm = mesh_io.read(os.path.join(a.case, "constant", "polyMesh"))
    walls = [p.name for p in pm.patches if p.type == "wall"]
    changed = []
    for fname, wf in _WALL_FN.items():
        path = os.path.join(a.case, a.time, fname)
        if not os.path.exists(path):
            continue
        d = parse_file(path)
        bf = d.get("boundaryField")
        if not isinstance(bf, FoamDict):
            continue
        n = 0
        for pname in walls:
            if pname in bf and isinstance(bf[pname], FoamDict):
                bf[pname]["type"] = wf
                if "value" not in bf[pname]:
                    bf[pname]["value"] = "uniform 0"
                n += 1
        if n:
            write_file(path, d, foamfile={"class": "volScalarField"
                                          if fname != "U" else
                                          "volVectorField",
                                          "object": fname})
            changed.append(f"{fname}->{wf}({n})")
    print(f"applyWallFunctionBoundaryConditions: {changed}")
    return 0


def wall_function_table_cmd(argv) -> int:
    """wallFunctionTable: tabulate u+(y+) from Spalding's law by
    Newton inversion and write constant/wallFunctionTable (reference:
    .../preProcessing/wallFunctionTable/ — tabulatedWallFunction)."""
    ap = argparse.ArgumentParser(prog="wallFunctionTable")
    ap.add_argument("-case", default=".")
    ap.add_argument("-kappa", type=float, default=0.41)
    ap.add_argument("-E", type=float, default=9.8)
    ap.add_argument("-n", type=int, default=100)
    ap.add_argument("-ypMax", type=float, default=1000.0)
    a = ap.parse_args(argv)
    yp = np.geomspace(0.1, a.ypMax, a.n)
    up = np.minimum(yp, np.log(np.maximum(a.E * yp, 1.001))
                    / a.kappa)          # initial guess
    for _ in range(60):
        kUp = np.minimum(a.kappa * up, 50.0)
        f = (up + (np.exp(kUp) - 1.0 - kUp - kUp ** 2 / 2
                   - kUp ** 3 / 6) / a.E - yp)
        df = 1.0 + (a.kappa * (np.exp(kUp) - 1.0 - kUp
                               - kUp ** 2 / 2)) / a.E
        up = np.maximum(up - f / df, 0.0)
    out = os.path.join(a.case, "constant", "wallFunctionTable")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("// y+   u+  (Spalding, kappa=%g E=%g)\n"
                % (a.kappa, a.E))
        for y, u in zip(yp, up):
            f.write(f"{y:.8g} {u:.8g}\n")
    print(f"wallFunctionTable: {a.n} rows, u+({a.ypMax:g}) = "
          f"{up[-1]:.4g} -> {out}")
    return 0


def face_agglomerate_cmd(argv) -> int:
    """faceAgglomerate: cluster each patch's faces into coarse
    agglomerations (grid binning of face centres; reference:
    .../preProcessing/faceAgglomerate/ — used by viewFactor
    radiation). Writes constant/faceAgglomeration."""
    ap = argparse.ArgumentParser(prog="faceAgglomerate")
    ap.add_argument("-case", default=".")
    ap.add_argument("-nCoarse", type=int, default=16)
    a = ap.parse_args(argv)
    from ..io import polymesh as mesh_io

    pm = mesh_io.read(os.path.join(a.case, "constant", "polyMesh"))
    out = os.path.join(a.case, "constant", "faceAgglomeration")
    lines = []
    total = 0
    for p in pm.patches:
        if p.size == 0 or p.type in ("empty",):
            continue
        cf = pm.cf[p.start:p.start + p.size]
        lo, hi = cf.min(axis=0), cf.max(axis=0)
        ext = np.maximum(hi - lo, 1e-30)
        # bin along the two largest extents
        dims = np.argsort(ext)[::-1][:2]
        nside = max(1, int(np.sqrt(a.nCoarse)))
        ij = np.floor((cf[:, dims] - lo[dims]) / ext[dims]
                      * nside).astype(int)
        ij = np.clip(ij, 0, nside - 1)
        flat = ij[:, 0] * nside + ij[:, 1]
        _, cid = np.unique(flat, return_inverse=True)
        total += int(cid.max()) + 1
        lines.append((p.name, cid))
    with open(out, "w") as f:
        f.write("// per-patch agglomeration index\n")
        for name, cid in lines:
            f.write(f"{name} {len(cid)}\n(\n")
            f.write("\n".join(str(int(c)) for c in cid))
            f.write("\n)\n")
    print(f"faceAgglomerate: {total} coarse faces over "
          f"{len(lines)} patches -> {out}")
    return 0


def view_factors_gen_cmd(argv) -> int:
    """viewFactorsGen: assemble and write the enclosure view-factor
    matrix (reference: .../preProcessing/viewFactorsGen/). Row sums
    are the closure check (=1 for a closed enclosure)."""
    ap = argparse.ArgumentParser(prog="viewFactorsGen")
    ap.add_argument("-case", default=".")
    ap.add_argument("-patches", default=None,
                    help="comma list (default: all wall patches)")
    a = ap.parse_args(argv)
    from ..io import polymesh as mesh_io
    from ..models.radiation import make_viewfactor

    pm = mesh_io.read(os.path.join(a.case, "constant", "polyMesh"))
    names = (a.patches.split(",") if a.patches
             else [p.name for p in pm.patches if p.type == "wall"])
    vf = make_viewfactor(pm, names)
    F = np.asarray(vf.F)
    out = os.path.join(a.case, "constant", "F")
    with open(out, "w") as f:
        f.write(f"// viewFactor matrix {F.shape[0]}x{F.shape[1]}\n")
        f.write(f"{F.shape[0]}\n(\n")
        for row in F:
            f.write("(" + " ".join(f"{v:.7g}" for v in row) + ")\n")
        f.write(")\n")
    rs = F.sum(axis=1)
    print(f"viewFactorsGen: {F.shape[0]} faces, row sums "
          f"[{rs.min():.4g}, {rs.max():.4g}] -> {out}")
    return 0


def create_turbulence_fields_cmd(argv) -> int:
    """createTurbulenceFields: write R (Boussinesq) and the missing
    member of the (epsilon, omega) pair from the latest time
    (reference: .../postProcessing/turbulence/createTurbulenceFields/)."""
    from ..core.dimensions import DimensionSet
    from .postutils import _open_case, _write, r_cmd

    args, case, mesh, t = _open_case(list(argv))
    k = np.asarray(case.read_field("k", time=t).data)
    wrote = []
    try:
        eps = np.asarray(case.read_field("epsilon", time=t).data)
        _write(case, mesh, t, "omega", eps / np.maximum(0.09 * k,
                                                        1e-30),
               dims=DimensionSet.of(0, 0, -1))
        wrote.append("omega")
    except Exception:
        try:
            om = np.asarray(case.read_field("omega", time=t).data)
            _write(case, mesh, t, "epsilon", 0.09 * k * om,
                   dims=DimensionSet.of(0, 2, -3))
            wrote.append("epsilon")
        except Exception:
            pass
    r_cmd(list(argv))
    wrote.append("R")
    print(f"createTurbulenceFields: wrote {wrote} at t={t}")
    return 0


# ---------------------------------------------------------------------------
# equilibrium thermo (Kp from janaf Gibbs energies)
# ---------------------------------------------------------------------------


def _janaf_g_mol(entry, T: float) -> float:
    """Molar Gibbs energy g = h - T s [J/kmol] from NASA-7 coeffs."""
    W, lo, hi, Tc = _species_from_dict(entry)
    a = lo if T < Tc else hi
    h_mol = _janaf_h(lo, hi, Tc, W, T) * W
    s_R = (a[0] * np.log(T) + a[1] * T + a[2] * T ** 2 / 2
           + a[3] * T ** 3 / 3 + a[4] * T ** 4 / 4 + a[6])
    return h_mol - T * s_R * R_UNIV


def kp_co2(thermo: Dict, T: float) -> float:
    """Kp [atm^0.5] of CO2 <-> CO + 1/2 O2."""
    dG = (_janaf_g_mol(thermo["CO"], T)
          + 0.5 * _janaf_g_mol(thermo["O2"], T)
          - _janaf_g_mol(thermo["CO2"], T))
    return float(np.exp(-dG / (R_UNIV * T)))


def kp_h2o(thermo: Dict, T: float) -> float:
    """Kp [atm^0.5] of H2O <-> H2 + 1/2 O2."""
    dG = (_janaf_g_mol(thermo["H2"], T)
          + 0.5 * _janaf_g_mol(thermo["O2"], T)
          - _janaf_g_mol(thermo["H2O"], T))
    return float(np.exp(-dG / (R_UNIV * T)))


def _equilibrium_products(thermo, c, w, e, n2, T, p_atm=1.0):
    """Dissociated product mole numbers at T: c mol CO2, w mol H2O,
    e mol excess O2, n2 mol N2 in the complete-combustion limit.
    Returns a {species: moles} dict after relaxing
    CO2<->CO+1/2 O2 and H2O<->H2+1/2 O2 to equilibrium."""
    k1, k2 = kp_co2(thermo, T), kp_h2o(thermo, T)
    x1, x2 = 0.01, 0.001
    for _ in range(200):
        nO2 = e + 0.5 * (c * x1 + w * x2)
        N = c + w + e + n2 + 0.5 * (c * x1 + w * x2)
        pO2 = max(nO2 / N * p_atm, 1e-30)
        x1n = k1 / (k1 + np.sqrt(pO2))
        x2n = k2 / (k2 + np.sqrt(pO2))
        x1 = 0.5 * x1 + 0.5 * x1n
        x2 = 0.5 * x2 + 0.5 * x2n
        if abs(x1n - x1) < 1e-12 and abs(x2n - x2) < 1e-12:
            break
    return {"CO2": c * (1 - x1), "CO": c * x1,
            "H2O": w * (1 - x2), "H2": w * x2,
            "O2": e + 0.5 * (c * x1 + w * x2), "N2": n2}


def equilibrium_flame_t_cmd(argv) -> int:
    """equilibriumFlameT <controlFile>: adiabatic flame temperature
    WITH CO2/H2O dissociation equilibrium (reference:
    .../thermophysical/equilibriumFlameT/). Control file: thermo path,
    T0, reactants dict, products dict (complete-combustion moles of
    CO2/H2O/O2/N2)."""
    ap = argparse.ArgumentParser(prog="equilibriumFlameT")
    ap.add_argument("control")
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)
    d = parse_file(a.control if os.path.exists(a.control)
                   else os.path.join(a.case, a.control))
    tpath = str(d.get("thermo", "constant/thermo.compressibleGas"))
    if not os.path.isabs(tpath):
        tpath = os.path.join(a.case, tpath)
    thermo = parse_file(tpath)
    T0 = float(d.get("T0", 298.15))
    reac = {str(k): float(v) for k, v in d["reactants"].items()}
    prod = {str(k): float(v) for k, v in d["products"].items()}
    c = prod.get("CO2", 0.0)
    w = prod.get("H2O", 0.0)
    e = prod.get("O2", 0.0)
    n2 = prod.get("N2", 0.0)
    h0, _ = mixture_h(thermo, reac, T0)
    T = 2000.0
    for _ in range(100):
        peq = _equilibrium_products(thermo, c, w, e, n2, T)
        h, cp = mixture_h(thermo, peq, T)
        dT = (h0 - h) / max(cp, 1e-3)
        # dissociation enthalpy feedback makes cp alone an
        # underestimate of dh/dT near equilibrium: damp the update
        T = min(max(T + 0.5 * dT, 300.0), 5000.0)
        if abs(dT) < 1e-6:
            break
    xi = peq["CO"] / max(peq["CO"] + peq["CO2"], 1e-30)
    print(f"Equilibrium flame temperature = {T:.2f} K "
          f"(CO/(CO+CO2) = {xi:.4f})")
    return 0


def equilibrium_co_cmd(argv) -> int:
    """equilibriumCO <controlFile>: CO/CO2 equilibrium split of
    combustion products over a temperature range (reference:
    .../thermophysical/equilibriumCO/)."""
    ap = argparse.ArgumentParser(prog="equilibriumCO")
    ap.add_argument("control")
    ap.add_argument("-case", default=".")
    ap.add_argument("-Tlow", type=float, default=1000.0)
    ap.add_argument("-Thigh", type=float, default=3000.0)
    ap.add_argument("-nT", type=int, default=9)
    a = ap.parse_args(argv)
    d = parse_file(a.control if os.path.exists(a.control)
                   else os.path.join(a.case, a.control))
    tpath = str(d.get("thermo", "constant/thermo.compressibleGas"))
    if not os.path.isabs(tpath):
        tpath = os.path.join(a.case, tpath)
    thermo = parse_file(tpath)
    prod = {str(k): float(v) for k, v in d["products"].items()}
    c = prod.get("CO2", 0.0)
    w = prod.get("H2O", 0.0)
    e = prod.get("O2", 0.0)
    n2 = prod.get("N2", 0.0)
    print("      T [K]    Kp(CO2)      CO/(CO+CO2)")
    last = 0.0
    for T in np.linspace(a.Tlow, a.Thigh, a.nT):
        peq = _equilibrium_products(thermo, c, w, e, n2, float(T))
        xi = peq["CO"] / max(peq["CO"] + peq["CO2"], 1e-30)
        print(f"  {T:9.1f}  {kp_co2(thermo, float(T)):11.4e}  {xi:.6f}")
        last = xi
    print(f"equilibriumCO: CO fraction at {a.Thigh:g} K = {last:.4f}")
    return 0


COMMANDS = {
    "applyWallFunctionBoundaryConditions": apply_wall_function_bcs_cmd,
    "wallFunctionTable": wall_function_table_cmd,
    "faceAgglomerate": face_agglomerate_cmd,
    "viewFactorsGen": view_factors_gen_cmd,
    "createTurbulenceFields": create_turbulence_fields_cmd,
    "equilibriumFlameT": equilibrium_flame_t_cmd,
    "equilibriumCO": equilibrium_co_cmd,
}
