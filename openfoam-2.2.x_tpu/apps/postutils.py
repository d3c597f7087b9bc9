"""Post-processing field utilities (reference:
applications/utilities/postProcessing/{velocityField,pressureField,
wall,turbulence,patch,stressField,miscellaneous}/ and
preProcessing/applyBoundaryLayer/).

Each command reads the requested (default: latest) time, derives the
field, and writes it back into the same time directory — the same
read/derive/write contract as the reference's one-shot utilities.
Symmetric-tensor outputs are written as six scalar component fields
(xx, xy, xz, yy, yz, zz) — documented deviation: there is no
volSymmTensorField writer."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _open_case(argv, extra=()):
    ap = argparse.ArgumentParser()
    for name, kw in extra:
        ap.add_argument(name, **kw)
    ap.add_argument("-case", default=".")
    ap.add_argument("-time", default=None)
    args = ap.parse_args(argv)
    from ..core.case import Case

    case = Case(args.case)
    t = args.time or case.latest_time_name()
    return args, case, case.mesh, t


def _write(case, mesh, t, name, data, dims=None):
    import jax.numpy as jnp

    from ..core.dimensions import dimless
    from ..core.fields import vol_scalar, vol_vector
    from ..io import fields as field_io

    data = np.asarray(data)
    if data.ndim == 2:
        out = vol_vector(mesh, (0.0, 0.0, 0.0), name=name,
                         dims=dims or dimless)
    else:
        out = vol_scalar(mesh, 0.0, name=name, dims=dims or dimless)
    out = out.with_data(jnp.asarray(data, mesh.v.dtype))
    field_io.write_field(out, mesh, case.dir, t)
    print(f"{name}: wrote {name} at time {t}")


def _sym_grad(mesh, U):
    """grad U [nC,3,3] -> (S, Omega) symmetric/antisymmetric parts."""
    from ..ops import fvc

    g = np.asarray(fvc.grad(mesh, U))          # g[c,i,j] = d(u_j)/d(x_i)
    S = 0.5 * (g + np.transpose(g, (0, 2, 1)))
    W = 0.5 * (g - np.transpose(g, (0, 2, 1)))
    return S, W


def _nu(case):
    from ..core.dictionary import dimensioned_scalar

    tp = case.transport_properties()
    _, nu = dimensioned_scalar(tp.get("nu", 1e-6))
    return float(nu)


# ---------------------------------------------------------------------------
# velocityField
# ---------------------------------------------------------------------------

def vorticity_cmd(argv) -> int:
    """vorticity = curl(U) (reference: postProcessing/velocityField/
    vorticity/)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet
    from ..ops import fvc

    U = case.read_field("U", time=t)
    _write(case, mesh, t, "vorticity", fvc.curl(mesh, U),
           dims=DimensionSet.of(0, 0, -1))
    return 0


def enstrophy_cmd(argv) -> int:
    """enstrophy = 0.5 |curl U|^2 (reference: postProcessing/
    velocityField/enstrophy/)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet
    from ..ops import fvc

    U = case.read_field("U", time=t)
    w = np.asarray(fvc.curl(mesh, U))
    _write(case, mesh, t, "enstrophy", 0.5 * (w * w).sum(axis=1),
           dims=DimensionSet.of(0, 0, -2))
    return 0


def q_cmd(argv) -> int:
    """Q = 0.5 (|Omega|^2 - |S|^2) (reference: postProcessing/
    velocityField/Q/)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet

    U = case.read_field("U", time=t)
    S, W = _sym_grad(mesh, U)
    Q = 0.5 * ((W * W).sum(axis=(1, 2)) - (S * S).sum(axis=(1, 2)))
    _write(case, mesh, t, "Q", Q, dims=DimensionSet.of(0, 0, -2))
    return 0


def lambda2_cmd(argv) -> int:
    """Lambda2 = second eigenvalue of S^2 + Omega^2 (reference:
    postProcessing/velocityField/Lambda2/)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet

    U = case.read_field("U", time=t)
    S, W = _sym_grad(mesh, U)
    M = np.einsum("cij,cjk->cik", S, S) \
        + np.einsum("cij,cjk->cik", W, W)
    M = 0.5 * (M + np.transpose(M, (0, 2, 1)))   # symmetrise
    lam = np.linalg.eigvalsh(M)                  # ascending
    _write(case, mesh, t, "Lambda2", lam[:, 1],
           dims=DimensionSet.of(0, 0, -2))
    return 0


def flowtype_cmd(argv) -> int:
    """flowType = (|D| - |Omega|)/(|D| + |Omega|): -1 rotation,
    0 shear, +1 extension (reference: postProcessing/velocityField/
    flowType/)."""
    args, case, mesh, t = _open_case(argv)
    U = case.read_field("U", time=t)
    S, W = _sym_grad(mesh, U)
    magS = np.sqrt((S * S).sum(axis=(1, 2)))
    magW = np.sqrt((W * W).sum(axis=(1, 2)))
    _write(case, mesh, t, "flowType",
           (magS - magW) / np.maximum(magS + magW, 1e-30))
    return 0


def co_cmd(argv) -> int:
    """Courant number from the flux of U and controlDict deltaT
    (reference: postProcessing/velocityField/Co/)."""
    args, case, mesh, t = _open_case(argv)
    from ..ops import fvc

    U = case.read_field("U", time=t)
    phi = np.asarray(fvc.flux(mesh, U))
    dt = float(case.control_dict.get("deltaT", 1.0))
    sum_phi = np.abs(phi)[np.asarray(mesh.cface)] \
        * np.abs(np.asarray(mesh.csign))
    co = 0.5 * dt * sum_phi.sum(axis=1) / np.asarray(mesh.v)
    _write(case, mesh, t, "Co", co)
    print(f"Co: max = {co.max():.6g}, mean = {co.mean():.6g}")
    return 0


def pe_cmd(argv) -> int:
    """Face Peclet number |phi_f| / (|Sf| deltaCoeffs nuEff), reduced
    to each cell's max (reference: postProcessing/velocityField/Pe/
    writes the surface field; cell-max here — documented)."""
    args, case, mesh, t = _open_case(argv)
    from ..ops import fvc

    U = case.read_field("U", time=t)
    nu = _nu(case)
    try:
        nut = np.asarray(case.read_field("nut", time=t).data)
    except Exception:
        nut = 0.0
    phi = np.asarray(fvc.flux(mesh, U))
    pe_f = np.abs(phi) / (np.asarray(mesh.mag_sf)
                          * np.asarray(mesh.delta_coeffs) + 1e-300)
    cface = np.asarray(mesh.cface)
    valid = np.abs(np.asarray(mesh.csign)) > 0
    pe_c = np.where(valid, pe_f[cface], 0.0).max(axis=1) \
        / (nu + nut + 1e-300)
    _write(case, mesh, t, "Pe", pe_c)
    print(f"Pe: max = {pe_c.max():.6g}")
    return 0


def uprime_cmd(argv) -> int:
    """uprime = sqrt(2k/3) (reference: postProcessing/velocityField/
    uprime/)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet

    k = np.asarray(case.read_field("k", time=t).data)
    _write(case, mesh, t, "uprime", np.sqrt(2.0 * k / 3.0),
           dims=DimensionSet.of(0, 1, -1))
    return 0


def mach_cmd(argv) -> int:
    """Ma = |U| / sqrt(gamma R T) (reference: postProcessing/
    compressible/Mach/)."""
    args, case, mesh, t = _open_case(argv)
    from ..models import thermo as thermo_mod

    th = thermo_mod.from_dict(
        case.properties("thermophysicalProperties"))
    U = np.asarray(case.read_field("U", time=t).data)
    T = np.asarray(case.read_field("T", time=t).data)
    cp = np.asarray(th.Cp_of(T))
    gamma = cp / np.maximum(cp - th.R, 1e-30)
    c = np.sqrt(gamma * th.R * np.maximum(T, 1.0))
    _write(case, mesh, t, "Ma", np.linalg.norm(U, axis=1) / c)
    return 0


def ptot_cmd(argv) -> int:
    """Total pressure. Kinematic p [m^2/s^2]: ptot = p + 0.5|U|^2;
    absolute p with a readable T: ptot = p + 0.5 rho |U|^2
    (reference: postProcessing/miscellaneous/ptot/)."""
    args, case, mesh, t = _open_case(argv)
    p = case.read_field("p", time=t)
    U = np.asarray(case.read_field("U", time=t).data)
    k = 0.5 * (U * U).sum(axis=1)
    pd = np.asarray(p.data)
    try:
        from ..models import thermo as thermo_mod

        th = thermo_mod.from_dict(
            case.properties("thermophysicalProperties"))
        T = np.asarray(case.read_field("T", time=t).data)
        rho = np.asarray(th.rho(p.data, T))
        ptot = pd + rho * k
    except Exception:
        ptot = pd + k
    _write(case, mesh, t, "ptot", ptot, dims=p.dims)
    return 0


# ---------------------------------------------------------------------------
# wall
# ---------------------------------------------------------------------------

def _wall_patches(mesh):
    nif = mesh.n_internal_faces
    for p in mesh.patches:
        if p.type == "wall":
            yield p, np.asarray(mesh.owner[p.slice]), \
                slice(p.slice.start - nif, p.slice.stop - nif)


def wallgradu_cmd(argv) -> int:
    """wallGradU: snGrad(U) on wall patches, stored in the
    wall-adjacent cells (internal elsewhere zero; the reference writes
    it as patch fields — documented) (reference: postProcessing/wall/
    wallGradU/)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet

    U = case.read_field("U", time=t)
    bv = np.asarray(U.boundary_values(mesh))
    dc = np.asarray(mesh.delta_coeffs)
    Ud = np.asarray(U.data)
    out = np.zeros_like(Ud)
    for p, own, bsl in _wall_patches(mesh):
        g = (bv[bsl] - Ud[own]) * dc[p.slice][:, None]
        np.add.at(out, own, g)
    _write(case, mesh, t, "wallGradU", out,
           dims=DimensionSet.of(0, 0, -1))
    return 0


def wallheatflux_cmd(argv) -> int:
    """wallHeatFlux: q = kappa snGrad(T), integrated per wall patch
    (reference: postProcessing/wall/wallHeatFlux/)."""
    args, case, mesh, t = _open_case(argv)
    from ..models import thermo as thermo_mod

    th = thermo_mod.from_dict(
        case.properties("thermophysicalProperties"))
    T = case.read_field("T", time=t)
    Td = np.asarray(T.data)
    bv = np.asarray(T.boundary_values(mesh))
    dc = np.asarray(mesh.delta_coeffs)
    msf = np.asarray(mesh.mag_sf)
    cp_w = np.asarray(th.Cp_of(T.data))
    kappa_c = th.mu * cp_w / th.Pr                  # [W/m/K]
    total = 0.0
    for p, own, bsl in _wall_patches(mesh):
        q = kappa_c[own] * (bv[bsl] - Td[own]) * dc[p.slice]
        Q = float((q * msf[p.slice]).sum())
        total += Q
        print(f"wallHeatFlux: patch {p.name}: integral = {Q:.6g} W, "
              f"min = {q.min():.6g}, max = {q.max():.6g} W/m^2")
    print(f"wallHeatFlux: total = {total:.6g} W")
    return 0


def yplus_cmd(argv) -> int:
    """yPlusRAS/yPlusLES: u_tau from the wall velocity gradient,
    y+ = u_tau y_c / nu per wall patch (reference: postProcessing/
    wall/{yPlusRAS,yPlusLES}/)."""
    args, case, mesh, t = _open_case(argv)
    U = case.read_field("U", time=t)
    nu = _nu(case)
    try:
        nut = np.asarray(case.read_field("nut", time=t).data)
    except Exception:
        nut = np.zeros(mesh.n_cells)
    bv = np.asarray(U.boundary_values(mesh))
    dc = np.asarray(mesh.delta_coeffs)
    Ud = np.asarray(U.data)
    out = np.zeros(mesh.n_cells)
    for p, own, bsl in _wall_patches(mesh):
        dU = np.linalg.norm(bv[bsl] - Ud[own], axis=1) * dc[p.slice]
        utau = np.sqrt((nu + nut[own]) * dU)
        yp = utau / (dc[p.slice] * nu + 1e-300)
        np.maximum.at(out, own, yp)
        print(f"yPlus: patch {p.name}: min = {yp.min():.6g}, "
              f"max = {yp.max():.6g}, avg = {yp.mean():.6g}")
    _write(case, mesh, t, "yPlus", out)
    return 0


# ---------------------------------------------------------------------------
# turbulence / stress
# ---------------------------------------------------------------------------

def r_cmd(argv) -> int:
    """R = 2/3 k I - nut (grad U + grad U^T): Boussinesq Reynolds
    stress, written as six component fields (reference:
    postProcessing/turbulence/R/)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet

    k = np.asarray(case.read_field("k", time=t).data)
    nut = np.asarray(case.read_field("nut", time=t).data)
    U = case.read_field("U", time=t)
    S, _ = _sym_grad(mesh, U)
    R = -2.0 * nut[:, None, None] * S
    for i in range(3):
        R[:, i, i] += 2.0 / 3.0 * k
    for (i, j), tag in zip([(0, 0), (0, 1), (0, 2), (1, 1), (1, 2),
                            (2, 2)],
                           ["xx", "xy", "xz", "yy", "yz", "zz"]):
        _write(case, mesh, t, f"R{tag}", R[:, i, j],
               dims=DimensionSet.of(0, 2, -2))
    return 0


def stresscomponents_cmd(argv) -> int:
    """sigma = 2 nu symm(grad U) (kinematic, incompressible), six
    component fields (reference: postProcessing/stressField/
    stressComponents/)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet

    nu = _nu(case)
    U = case.read_field("U", time=t)
    S, _ = _sym_grad(mesh, U)
    sig = 2.0 * nu * S
    for (i, j), tag in zip([(0, 0), (0, 1), (0, 2), (1, 1), (1, 2),
                            (2, 2)],
                           ["xx", "xy", "xz", "yy", "yz", "zz"]):
        _write(case, mesh, t, f"sigma{tag}", sig[:, i, j],
               dims=DimensionSet.of(0, 2, -2))
    return 0


# ---------------------------------------------------------------------------
# patch
# ---------------------------------------------------------------------------

def patchintegrate_cmd(argv) -> int:
    """patchIntegrate <field> <patch>: area integral of a field over
    one patch (reference: postProcessing/patch/patchIntegrate/)."""
    args, case, mesh, t = _open_case(
        argv, extra=[("field", {}), ("patch", {})])
    f = case.read_field(args.field, time=t)
    bv = np.asarray(f.boundary_values(mesh))
    nif = mesh.n_internal_faces
    msf = np.asarray(mesh.mag_sf)
    for p in mesh.patches:
        if p.name == args.patch:
            bsl = slice(p.slice.start - nif, p.slice.stop - nif)
            vals = bv[bsl]
            area = msf[p.slice]
            if vals.ndim == 2:
                integ = (vals * area[:, None]).sum(axis=0)
                print(f"patchIntegrate: {args.field} over {p.name} = "
                      f"({integ[0]:.6g} {integ[1]:.6g} {integ[2]:.6g})"
                      f", area = {area.sum():.6g}")
            else:
                print(f"patchIntegrate: {args.field} over {p.name} = "
                      f"{(vals * area).sum():.6g}, "
                      f"area = {area.sum():.6g}")
            return 0
    print(f"patchIntegrate: no patch {args.patch!r}", file=sys.stderr)
    return 1


# ---------------------------------------------------------------------------
# preProcessing
# ---------------------------------------------------------------------------

def applyboundarylayer_cmd(argv) -> int:
    """applyBoundaryLayer [-ybl <m>]: 1/7th power-law velocity profile
    inside the given boundary-layer thickness, with consistent k,
    epsilon, nut when present (reference: preProcessing/
    applyBoundaryLayer/)."""
    args, case, mesh, t = _open_case(
        argv, extra=[("-ybl", {"type": float, "default": 0.05})])
    import jax.numpy as jnp

    from ..io import fields as field_io
    from ..mesh.walldist import wall_distance

    y = np.asarray(wall_distance(case.poly_mesh))
    U = case.read_field("U", time=t)
    Ud = np.asarray(U.data)
    scale = np.minimum((np.maximum(y, 1e-12) / args.ybl)
                       ** (1.0 / 7.0), 1.0)
    Unew = Ud * scale[:, None]
    field_io.write_field(U.with_data(jnp.asarray(Unew, mesh.v.dtype)),
                         mesh, case.dir, t)
    print(f"applyBoundaryLayer: scaled U inside ybl={args.ybl}")
    # consistent turbulence fields (reference formulas)
    mag = np.linalg.norm(Unew, axis=1)
    try:
        kf = case.read_field("k", time=t)
        Cmu = 0.09
        kbl = np.maximum(1.5 * (0.05 * mag) ** 2, 1e-10)
        field_io.write_field(
            kf.with_data(jnp.asarray(kbl, mesh.v.dtype)),
            mesh, case.dir, t)
        ef = case.read_field("epsilon", time=t)
        ebl = Cmu ** 0.75 * kbl ** 1.5 / (0.4 * np.maximum(
            np.minimum(y, args.ybl), 1e-6))
        field_io.write_field(
            ef.with_data(jnp.asarray(ebl, mesh.v.dtype)),
            mesh, case.dir, t)
        print("applyBoundaryLayer: rewrote k/epsilon")
    except Exception:
        pass
    return 0


def wallshearstress_cmd(argv) -> int:
    """wallShearStress: tau_w = -(nu+nut) snGrad(U) per wall patch
    (reference: postProcessing/wall/wallShearStress/ — the utility
    twin of the functionObject)."""
    args, case, mesh, t = _open_case(argv)
    from ..core.dimensions import DimensionSet

    U = case.read_field("U", time=t)
    nu = _nu(case)
    try:
        nut = np.asarray(case.read_field("nut", time=t).data)
    except Exception:
        nut = np.zeros(mesh.n_cells)
    bv = np.asarray(U.boundary_values(mesh))
    dc = np.asarray(mesh.delta_coeffs)
    Ud = np.asarray(U.data)
    out = np.zeros_like(Ud)
    for p, own, bsl in _wall_patches(mesh):
        tau = -(nu + nut[own])[:, None] * (bv[bsl] - Ud[own]) \
            * dc[p.slice][:, None]
        mag = np.linalg.norm(tau, axis=1)
        print(f"wallShearStress: patch {p.name}: min = "
              f"{mag.min():.6g}, max = {mag.max():.6g} m^2/s^2")
        np.add.at(out, own, tau)
    _write(case, mesh, t, "wallShearStress", out,
           dims=DimensionSet.of(0, 2, -2))
    return 0


def engine_comp_ratio_cmd(argv) -> int:
    """engineCompRatio: (Vbdc = Vc + Vs) / Vtdc from
    constant/engineGeometry (reference: postProcessing/miscellaneous/
    engineCompRatio/ — there from meshed volumes; here from the
    slider-crank geometry the engine mesh motion uses)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)
    from ..core.case import Case
    from ..mesh import engine as eng_mod

    case = Case(a.case)
    geom = eng_mod.from_dict(case.properties("engineGeometry"))
    eps = (geom.clearance + geom.stroke) / geom.clearance
    print(f"engineCompRatio: clearance = {geom.clearance} m, "
          f"stroke = {geom.stroke} m")
    print(f"Geometric compression ratio: {eps:.6g}")
    return 0


def pdf_plot_cmd(argv) -> int:
    """pdfPlot <field> [-nBins N]: volume-weighted histogram of a
    scalar field -> postProcessing/pdfPlot/<t>/<field>.xy (reference:
    postProcessing/miscellaneous/pdfPlot/)."""
    args, case, mesh, t = _open_case(
        argv, extra=[("field", {}),
                     ("-nBins", {"type": int, "default": 32})])
    f = case.read_field(args.field, time=t)
    data = np.asarray(f.data)
    if data.ndim == 2:
        data = np.linalg.norm(data, axis=1)
    v = np.asarray(mesh.v)
    hist, edges = np.histogram(data, bins=args.nBins, weights=v)
    hist = hist / (v.sum() * np.diff(edges))
    out_dir = os.path.join(case.dir, "postProcessing", "pdfPlot", t)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{args.field}.xy")
    with open(path, "w") as fh:
        fh.write(f"# {args.field} pdf (volume-weighted)\n")
        for c, h in zip(0.5 * (edges[:-1] + edges[1:]), hist):
            fh.write(f"{c:.8g} {h:.8g}\n")
    print(f"pdfPlot: wrote {path}")
    return 0


def probe_locations_cmd(argv) -> int:
    """probeLocations: sample fields at system/probesDict points over
    the chosen time (reference: postProcessing/sampling/
    probeLocations/)."""
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("-case", default=".")
    ap.add_argument("-time", default=None)
    a = ap.parse_args(argv)
    from ..core.case import Case
    from ..core.dictionary import parse_file

    case = Case(a.case)
    t = a.time or case.latest_time_name()
    mesh = case.mesh
    import os as _os

    d = parse_file(_os.path.join(a.case, "system", "probesDict"))
    pts = np.asarray(d.get("probeLocations", []),
                     dtype=float).reshape(-1, 3)
    fields = [str(x) for x in d.get("fields", [])]
    c = np.asarray(mesh.c)
    cells = [int(np.argmin(((c - p) ** 2).sum(axis=1))) for p in pts]
    for name in fields:
        f = case.read_field(name, time=t)
        data = np.asarray(f.data)
        for p, ci in zip(pts, cells):
            val = data[ci]
            s = (f"({val[0]:.6g} {val[1]:.6g} {val[2]:.6g})"
                 if data.ndim == 2 else f"{val:.6g}")
            print(f"probeLocations: {name} @ ({p[0]:g} {p[1]:g} "
                  f"{p[2]:g}) = {s}")
    return 0


COMMANDS = {
    "vorticity": vorticity_cmd,
    "enstrophy": enstrophy_cmd,
    "Q": q_cmd,
    "Lambda2": lambda2_cmd,
    "flowType": flowtype_cmd,
    "Co": co_cmd,
    "Pe": pe_cmd,
    "uprime": uprime_cmd,
    "Mach": mach_cmd,
    "ptot": ptot_cmd,
    "wallGradU": wallgradu_cmd,
    "wallHeatFlux": wallheatflux_cmd,
    "yPlusRAS": yplus_cmd,
    "yPlusLES": yplus_cmd,
    "R": r_cmd,
    "stressComponents": stresscomponents_cmd,
    "patchIntegrate": patchintegrate_cmd,
    "applyBoundaryLayer": applyboundarylayer_cmd,
    "wallShearStress": wallshearstress_cmd,
    "engineCompRatio": engine_comp_ratio_cmd,
    "pdfPlot": pdf_plot_cmd,
    "probeLocations": probe_locations_cmd,
}
