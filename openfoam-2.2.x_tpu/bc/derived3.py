"""Derived boundary conditions, batch 3 (round-3 breadth push #4).

Rebuilds of reference BCs from
src/finiteVolume/fields/fvPatchFields/derived/ in the data-driven
mixed form of bc/patchfields.py.

Kinds added here:
  advective, uniformFixedGradient (constant + table),
  pressureInletUniformVelocity, pressureNormalInletOutletVelocity,
  fixedShearStress, buoyantPressure,
  uniformDensityHydrostaticPressure (static, factory),
  turbulentHeatFluxTemperature, variableHeightFlowRateInletVelocity,
  fixedInternalValue (zeroGradient facade — the internal-cell forcing
  is a solver set_values concern in this framework),
  fixedPressureCompressibleDensity (barotropic rho from p),
  timeVaryingMappedFixedValue (constant/boundaryData time series,
  nearest-face spatial map, linear time interpolation).

Not built (documented gaps): fan / fixedJump cyclic-jump pairs — the
framework internalises conformal cyclics directly into the matrix
stencil, so jump conditions need a source-term seam that does not
exist yet.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import patchfields as pf
from .derived2 import _table_interp
from .patchfields import (_bcast, _col, _patch_delta, _patch_internal,
                          _patch_normals, _vc_fixed_value,
                          _vc_fixed_gradient, _vc_mixed)


class _Frozen:
    """Hashable-by-identity wrapper so large numpy tables can live in
    the static opts tuple without being unrolled into the jaxpr as
    python structure (the array itself becomes one traced constant)."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


# ---------------------------------------------------------------------------
# advective (the waveTransmissive base class, wave speed = |Un| only)
# ---------------------------------------------------------------------------


def _up_advective(bc, mesh, patch, internal, *, phi=None, dt=None,
                  **ctx):
    """advective (reference: fvPatchFields/derived/advective/): the
    outgoing-characteristic outflow at the material speed |Un| (no
    acoustic contribution — that is waveTransmissive's addition)."""
    from .patchfields import _up_wave_transmissive

    ctx.pop("c_sound", None)
    return _up_wave_transmissive(bc, mesh, patch, internal, phi=phi,
                                 dt=dt, c_sound=None, **ctx)


# ---------------------------------------------------------------------------
# pressure-driven velocity inlets
# ---------------------------------------------------------------------------


def _up_pressure_inlet_uniform_velocity(bc, mesh, patch, internal, *,
                                        phi=None, **ctx):
    """pressureInletUniformVelocity (reference: derived/
    pressureInletUniformVelocity/): the patch-average of the flux
    velocity applied uniformly along the face normals."""
    if phi is None:
        return bc
    sl = patch.slice
    mag = jnp.maximum(mesh.mag_sf[sl], 1e-30)
    n = mesh.sf[sl] / mag[:, None]
    u_avg = jnp.sum(phi[sl]) / jnp.sum(mag)
    u = u_avg * n
    return bc.replace(ref_value=u,
                      vfrac=jnp.ones(patch.size, internal.dtype))


def _up_pressure_normal_io_velocity(bc, mesh, patch, internal, *,
                                    phi=None, **ctx):
    """pressureNormalInletOutletVelocity (reference: derived/
    pressureNormalInletOutletVelocity/): zeroGradient on outflow; on
    inflow the velocity is the flux magnitude along the face normal."""
    if phi is None:
        return bc
    sl = patch.slice
    mag = jnp.maximum(mesh.mag_sf[sl], 1e-30)
    n = mesh.sf[sl] / mag[:, None]
    u = (phi[sl] / mag)[:, None] * n
    f = jnp.where(phi[sl] < 0.0, 1.0, 0.0).astype(internal.dtype)
    return bc.replace(ref_value=u, vfrac=f)


def _up_variable_height_flow_rate_inlet(bc, mesh, patch, internal, *,
                                        alpha_b=None, **ctx):
    """variableHeightFlowRateInletVelocity (reference: derived/
    variableHeightFlowRateInletVelocity/): inlet velocity distributing
    a prescribed volumetric flow rate over the wetted (alpha-weighted)
    part of the patch, U = -n flowRate alpha_f / sum(alpha_f |Sf|)."""
    sl = patch.slice
    q = float(bc.opt("flowRate", 0.0))
    mag = jnp.maximum(mesh.mag_sf[sl], 1e-30)
    n = mesh.sf[sl] / mag[:, None]
    if alpha_b is None:
        a = jnp.ones(patch.size, internal.dtype)
    else:
        a = jnp.clip(alpha_b[sl], 0.0, 1.0)
    denom = jnp.maximum(jnp.sum(a * mag), 1e-30)
    u = (-q * a / denom)[:, None] * n
    return bc.replace(ref_value=u,
                      vfrac=jnp.ones(patch.size, internal.dtype))


# ---------------------------------------------------------------------------
# wall stress / pressure gradients
# ---------------------------------------------------------------------------


def _up_fixed_shear_stress(bc, mesh, patch, internal, *, nu=None,
                           nut_b=None, **ctx):
    """fixedShearStress (reference: derived/fixedShearStress/): the
    wall velocity is set so the tangential viscous stress equals the
    prescribed (kinematic) tau:
        U_f = U_c,t + tau / (nuEff deltaCoeff)
    nuEff = nu + nut_b when the solver supplies the wall nut."""
    tau = bc.opt("tau")
    if tau is None or nu is None:
        return bc
    sl = patch.slice
    vi = _patch_internal(mesh, patch, internal)
    n = _patch_normals(mesh, patch).astype(vi.dtype)
    vit = vi - n * jnp.sum(n * vi, axis=1, keepdims=True)
    dc = mesh.delta_coeffs[sl]
    nu_eff = jnp.asarray(nu, vi.dtype)
    if nut_b is not None:
        nu_eff = nu_eff + nut_b[sl]
    tau_v = jnp.broadcast_to(
        jnp.asarray(tau, vi.dtype), (patch.size, 3))
    u = vit + tau_v / (_col(nu_eff * dc, tau_v) + 1e-30)
    return bc.replace(ref_value=u,
                      vfrac=jnp.ones(patch.size, vi.dtype))


def _up_buoyant_pressure(bc, mesh, patch, internal, *, rho_b=None,
                         g=None, **ctx):
    """buoyantPressure (reference: basic thermo BCs,
    buoyantPressureFvPatchScalarField): fixedGradient with
    snGrad(p) = rho (g . n) — the hydrostatic balance at the patch."""
    gv = g if g is not None else bc.opt("g", (0.0, 0.0, -9.81))
    gv = jnp.asarray(gv, internal.dtype).reshape(3)
    n = _patch_normals(mesh, patch).astype(internal.dtype)
    gn = n @ gv
    if rho_b is not None:
        cells = mesh.owner[patch.slice]
        r = rho_b[cells] if rho_b.shape[0] == internal.shape[0] \
            else rho_b[patch.slice]
        gn = gn * r
    else:
        gn = gn * float(bc.opt("rho", 1.0))
    return bc.replace(ref_grad=gn)


def _up_turbulent_heat_flux_T(bc, mesh, patch, internal, *,
                              alpha_eff_b=None, **ctx):
    """turbulentHeatFluxTemperature (reference:
    turbulenceModels/.../derivedFvPatchFields/turbulentHeatFluxTemperature):
    fixedGradient from a prescribed heat flux,
        snGrad(T) = q / (rho Cp alphaEff)
    mode `flux` gives q in W/m^2 (per face); mode `power` divides the
    total Q over the patch area. alphaEff comes from the solver when
    supplied, else the dictionary's laminar value."""
    mode = str(bc.opt("heatSource", "flux"))
    q = float(bc.opt("q", 0.0))
    rho_cp = float(bc.opt("rho", 1.2)) * float(bc.opt("Cp", 1005.0))
    sl = patch.slice
    if mode == "power":
        area = jnp.sum(mesh.mag_sf[sl])
        qf = q / jnp.maximum(area, 1e-30)
    else:
        qf = q
    if alpha_eff_b is not None:
        alpha = alpha_eff_b[sl]
    else:
        alpha = float(bc.opt("alphaEff", 2e-5))
    grad = qf / (rho_cp * alpha)
    return bc.replace(
        ref_grad=jnp.broadcast_to(jnp.asarray(grad, internal.dtype),
                                  (patch.size,)))


def _up_fixed_pressure_compressible_density(bc, mesh, patch, internal,
                                            *, p_b=None, **ctx):
    """fixedPressureCompressibleDensity (reference: derived/
    fixedPressureCompressibleDensity/, the cavitatingFoam barotropic
    closure): rho = rho0 + psi (p - p0) from the named pressure."""
    if p_b is None:
        return bc
    sl = patch.slice
    cells = mesh.owner[sl]
    p = p_b[cells] if p_b.shape[0] == internal.shape[0] else p_b[sl]
    rho0 = float(bc.opt("rho0", 1000.0))
    p0 = float(bc.opt("p0", 0.0))
    psi = float(bc.opt("psi", 1e-5))
    rho = rho0 + psi * (p - p0)
    return bc.replace(ref_value=rho,
                      vfrac=jnp.ones(patch.size, internal.dtype))


# ---------------------------------------------------------------------------
# uniformFixedGradient (constant / table)
# ---------------------------------------------------------------------------


def _up_uniform_fixed_gradient(bc, mesh, patch, internal, *, t=None,
                               **ctx):
    """uniformFixedGradient `table` form (reference: derived/
    uniformFixedGradient/): re-sample the gradient at the current
    time."""
    table = bc.opt("table")
    if table is None or t is None:
        return bc
    v = _table_interp(table, t, internal.dtype)
    rg = jnp.broadcast_to(v, (patch.size,) + jnp.shape(v))
    return bc.replace(ref_grad=rg)


# ---------------------------------------------------------------------------
# timeVaryingMappedFixedValue
# ---------------------------------------------------------------------------


def load_boundary_data(case_dir: str, patch_name: str, field_name: str,
                       cf: np.ndarray):
    """Read constant/boundaryData/<patch>/{points,<time>/<field>} and
    map sample points to the patch faces by nearest neighbour
    (reference: timeVaryingMappedFixedValueFvPatchField; the
    reference's triangulated planar interpolation is replaced by the
    nearest-sample map — documented deviation, exact when sample
    points coincide with face centres). Returns (times[nT],
    values[nT, nF(,3)]) or None."""
    import os

    from ..core.dictionary import parse_string

    root = os.path.join(case_dir, "constant", "boundaryData",
                        patch_name)
    pts_path = os.path.join(root, "points")
    if not os.path.isfile(pts_path):
        return None
    pts = np.asarray(parse_string("v " + open(pts_path).read())["v"],
                     dtype=float).reshape(-1, 3)
    times = sorted(
        (float(d), d) for d in os.listdir(root)
        if os.path.isfile(os.path.join(root, d, field_name)))
    if not times:
        return None
    # nearest sample for each face centre
    d2 = ((cf[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    nearest = d2.argmin(axis=1)
    vals = []
    for _, dname in times:
        body = open(os.path.join(root, dname, field_name)).read()
        d = parse_string("v " + body)
        arr = np.asarray(d["v"], dtype=float)
        if arr.ndim == 2:
            arr = arr.reshape(-1, 3)[nearest]
        else:
            arr = arr.reshape(-1)[nearest]
        vals.append(arr)
    return (np.asarray([t for t, _ in times]),
            np.stack(vals, axis=0))


def _up_time_varying_mapped(bc, mesh, patch, internal, *, t=None,
                            **ctx):
    """timeVaryingMappedFixedValue: linear interpolation between the
    two bracketing boundaryData snapshots at the solver time."""
    tbl = bc.opt("tvm")
    if tbl is None or t is None:
        return bc
    times, values = tbl.a  # _Frozen (np arrays -> jit constants)
    ts = jnp.asarray(times, internal.dtype)
    vs = jnp.asarray(values, internal.dtype)
    tt = jnp.clip(jnp.asarray(t, internal.dtype), ts[0], ts[-1])
    if ts.shape[0] == 1:
        rv = vs[0]
    else:
        i = jnp.clip(jnp.searchsorted(ts, tt, side="right") - 1, 0,
                     ts.shape[0] - 2)
        w = (tt - ts[i]) / jnp.maximum(ts[i + 1] - ts[i], 1e-30)
        rv = (1.0 - w) * vs[i] + w * vs[i + 1]
    return bc.replace(ref_value=rv)


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

pf.register_value_coeffs("advective", _vc_mixed)
pf.register_value_coeffs("pressureInletUniformVelocity", _vc_mixed)
pf.register_value_coeffs("pressureNormalInletOutletVelocity", _vc_mixed)
pf.register_value_coeffs("variableHeightFlowRateInletVelocity",
                         _vc_mixed)
pf.register_value_coeffs("fixedShearStress", _vc_mixed)
pf.register_value_coeffs("buoyantPressure", _vc_fixed_gradient)
pf.register_value_coeffs("turbulentHeatFluxTemperature",
                         _vc_fixed_gradient)
pf.register_value_coeffs("fixedPressureCompressibleDensity", _vc_mixed)
pf.register_value_coeffs("uniformFixedGradientT", _vc_fixed_gradient)
pf.register_value_coeffs("timeVaryingMappedFixedValue", _vc_fixed_value)

pf.register_update("advective", _up_advective)
pf.register_update("pressureInletUniformVelocity",
                   _up_pressure_inlet_uniform_velocity)
pf.register_update("pressureNormalInletOutletVelocity",
                   _up_pressure_normal_io_velocity)
pf.register_update("variableHeightFlowRateInletVelocity",
                   _up_variable_height_flow_rate_inlet)
pf.register_update("fixedShearStress", _up_fixed_shear_stress)
pf.register_update("buoyantPressure", _up_buoyant_pressure)
pf.register_update("turbulentHeatFluxTemperature",
                   _up_turbulent_heat_flux_T)
pf.register_update("fixedPressureCompressibleDensity",
                   _up_fixed_pressure_compressible_density)
pf.register_update("uniformFixedGradientT", _up_uniform_fixed_gradient)
pf.register_update("timeVaryingMappedFixedValue",
                   _up_time_varying_mapped)
