"""Derived boundary conditions, batch 4+ (round-3 breadth push #5).

Rebuilds of reference BCs in the data-driven mixed form of
bc/patchfields.py:

  constantAlphaContactAngle / dynamicAlphaContactAngle
    (src/transportModels/twoPhaseInterfaceProperties/
     alphaContactAngle/ — transport-wise a zeroGradient on alpha; the
     physics lives in interfaceProperties::correctContactAngle, rebuilt
     in models/interface.py::_correct_contact_angle)
  maxwellSlipU       (finiteVolume/fields/fvPatchFields/derived/ —
     rarefied tangential slip, rhoCentralFoam's wall BC)
  smoluchowskiJumpT  (temperature jump partner)
  fixedRho           (applications/solvers/compressible/rhoCentralFoam/
     BCs/rho/fixedRho — rho_b = psi * p_b)
  fanPressure        (derived/fanPressure/ — totalPressure minus a fan
     curve evaluated at the patch volumetric flow)
  syringePressure    (derived/syringePressure/ — isothermal gas
     compression under a trapezoidal piston-speed profile)
  pressureInletOutletParSlipVelocity (derived/ — tangential slip
     retained on inflow, zeroGradient on outflow)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from . import patchfields as pf
from .patchfields import (_bcast, _col, _patch_delta, _patch_internal,
                          _patch_normals, _vc_fixed_gradient,
                          _vc_fixed_value, _vc_mixed)

# ---------------------------------------------------------------------------
# alpha contact angle (zeroGradient facade; curvature correction is in
# models/interface.py)
# ---------------------------------------------------------------------------
# kind "alphaContactAngle": opts carry theta0 [rad] (+ uTheta, thetaA,
# thetaR for the dynamic variant). Transport-wise zeroGradient.

pf.register_value_coeffs("alphaContactAngle", _vc_fixed_gradient)


# ---------------------------------------------------------------------------
# rarefied-gas wall BCs (rhoCentralFoam)
# ---------------------------------------------------------------------------


def _up_maxwell_slip_u(bc, mesh, patch, internal, *, nu=None, T_b=None,
                       p_b=None, **ctx):
    """maxwellSlipU: mixed tangential slip
      U_w = (1-f) U_c,t,  f = 1/(1 + C λ Δ⁻¹... )
    with C = 2(2-sigma)/sigma and the mean free path λ from the
    dictionary (or from nu/T/p when the solver provides them):
    λ = nu sqrt(pi/(2 R T)). Normal component is always the wall value
    (no penetration)."""
    sl = patch.slice
    n = _patch_normals(mesh, patch)
    dc = _patch_delta(mesh, patch)
    sigma = float(bc.opt("accommodationCoeff", 1.0))
    lam = bc.opt("lambda", None)
    if lam is None:
        R = float(bc.opt("R", 287.0))
        if nu is not None and T_b is not None:
            nu_p = nu[mesh.owner[sl]] if hasattr(nu, "shape") \
                and getattr(nu, "ndim", 0) == 1 else nu
            lam = nu_p * jnp.sqrt(jnp.pi / (2.0 * R *
                                            jnp.maximum(T_b, 1.0)))
        else:
            lam = 1e-7
    C = 2.0 * (2.0 - sigma) / max(sigma, 1e-6)
    # slip length model: f = 1/(1 + C lam dc)
    f = 1.0 / (1.0 + C * jnp.asarray(lam, internal.dtype) * dc)
    uw = _bcast(bc.opt("Uwall", (0.0, 0.0, 0.0)), internal)
    # tangential blend toward the interior, normal pinned to wall
    ui = internal
    ui_t = ui - jnp.sum(ui * n, axis=1, keepdims=True) * n
    uw_n = jnp.sum(uw * n, axis=1, keepdims=True) * n
    ref = uw_n + (1.0 - f)[:, None] * ui_t \
        + f[:, None] * (uw - jnp.sum(uw * n, axis=1, keepdims=True) * n)
    return bc.replace(ref_value=ref,
                      vfrac=jnp.ones(patch.size, internal.dtype))


def _up_smoluchowski_jump_t(bc, mesh, patch, internal, *, nu=None,
                            p_b=None, **ctx):
    """smoluchowskiJumpT: temperature jump
      T_w' = (1-f) T_c + f T_wall,  f = 1/(1 + C λ Δ⁻¹...)
    C = 2(2-sigmaT)/sigmaT * 2 gamma/((gamma+1) Pr)."""
    dc = _patch_delta(mesh, patch)
    sigma = float(bc.opt("accommodationCoeff", 1.0))
    gamma = float(bc.opt("gamma", 1.4))
    Pr = float(bc.opt("Pr", 0.72))
    lam = bc.opt("lambda", 1e-7)
    C = (2.0 * (2.0 - sigma) / max(sigma, 1e-6)
         * 2.0 * gamma / ((gamma + 1.0) * Pr))
    f = 1.0 / (1.0 + C * jnp.asarray(lam, internal.dtype) * dc)
    tw = _bcast(bc.opt("Twall", 300.0), internal)
    return bc.replace(ref_value=tw, vfrac=f)


def _up_fixed_rho(bc, mesh, patch, internal, *, p_b=None, psi_b=None,
                  **ctx):
    """fixedRho: rho_b = psi * p_b (reference: rhoCentralFoam/BCs).
    Falls back to the stored value until the solver provides p."""
    if p_b is None:
        return bc
    sl = patch.slice
    psi = psi_b if psi_b is not None else float(bc.opt("psi", 1e-5))
    pb = p_b[sl] if getattr(p_b, "shape", (0,))[0] == mesh.n_faces \
        else p_b
    return bc.replace(ref_value=psi * pb,
                      vfrac=jnp.ones(patch.size, internal.dtype))


# ---------------------------------------------------------------------------
# fanPressure
# ---------------------------------------------------------------------------


def _up_fan_pressure(bc, mesh, patch, internal, *, phi=None, U=None,
                     rho_b=None, **ctx):
    """fanPressure (reference: derived/fanPressure/): total pressure
    minus the fan curve dp(V̇) evaluated at the patch volumetric flow.
    direction 'in': the fan blows INTO the domain (flow = -sum phi).
    The effective p0 then goes through the totalPressure closure
    (p = p0_eff on outflow, p0_eff - 0.5 (rho)|U|^2 on inflow) —
    the reference inherits totalPressureFvPatchScalarField::
    updateCoeffs (ADVICE r3 #2)."""
    if phi is None:
        return bc
    sl = patch.slice
    sgn = -1.0 if str(bc.opt("direction", "in")) == "in" else 1.0
    vdot = sgn * jnp.sum(phi[sl])
    tbl = bc.opt("fanCurve")
    if tbl is not None:
        xs = jnp.asarray(tbl.a[:, 0], internal.dtype)
        ys = jnp.asarray(tbl.a[:, 1], internal.dtype)
        dp = jnp.interp(jnp.maximum(vdot, 0.0), xs, ys)
    else:
        dp = 0.0
    p0 = _bcast(bc.opt("p0", 0.0), internal)
    p0_eff = p0 + dp * (1.0 if sgn < 0 else -1.0)
    ones = jnp.ones(patch.size, internal.dtype)
    if U is None:
        return bc.replace(ref_value=p0_eff, vfrac=ones)
    phib = phi[sl]
    cells = mesh.owner[sl]
    Ub = U[cells]
    magU2 = jnp.sum(Ub * Ub, axis=1)
    if rho_b is not None:
        magU2 = magU2 * rho_b[cells]
    pval = jnp.where(phib > 0.0, p0_eff, p0_eff - 0.5 * magU2)
    return bc.replace(ref_value=pval, vfrac=ones)


# ---------------------------------------------------------------------------
# syringePressure
# ---------------------------------------------------------------------------


def _syringe_volume(bc, t):
    """Gas volume in the syringe at time t under the trapezoidal
    piston-speed profile of the reference (Ap piston area, Sp max
    speed, ramp-up [tas,tae], ramp-down [tds,tde], initial VsI)."""
    Ap = float(bc.opt("Ap", 1e-4))
    Sp = float(bc.opt("Sp", 0.1))
    VsI = float(bc.opt("VsI", 1e-5))
    tas = float(bc.opt("tas", 0.0))
    tae = float(bc.opt("tae", 0.0))
    tds = float(bc.opt("tds", 1e30))
    tde = float(bc.opt("tde", 1e30))

    def ramp_integral(t):
        # integral of the speed fraction s(t): 0 before tas, linear
        # 0->1 on [tas,tae], 1 on [tae,tds], linear 1->0 on [tds,tde]
        t1 = jnp.clip(t, tas, tae)
        up = (t1 - tas) ** 2 / (2.0 * max(tae - tas, 1e-30))
        t2 = jnp.clip(t, tae, tds)
        mid = t2 - tae
        t3 = jnp.clip(t, tds, tde)
        dn = ((t3 - tds)
              - (t3 - tds) ** 2 / (2.0 * max(tde - tds, 1e-30)))
        return up + mid + dn

    # the piston sweeps Ap*Sp*integral of gas volume: compression
    return VsI - Ap * Sp * ramp_integral(t)


def _up_syringe_pressure(bc, mesh, patch, internal, *, t=None, **ctx):
    """syringePressure: isothermal compression p(t) = psI VsI / Vs(t)
    (reference: derived/syringePressure/ integrates the same piston
    profile with optional gas leakage ams — leakage not modelled,
    documented deviation)."""
    if t is None:
        return bc
    psI = float(bc.opt("psI", 1e5))
    VsI = float(bc.opt("VsI", 1e-5))
    Vs = jnp.maximum(_syringe_volume(bc, jnp.asarray(t)), 1e-12)
    p = psI * VsI / Vs
    return bc.replace(
        ref_value=jnp.full((patch.size,) + internal.shape[1:], p,
                           internal.dtype),
        vfrac=jnp.ones(patch.size, internal.dtype))


# ---------------------------------------------------------------------------
# pressureInletOutletParSlipVelocity
# ---------------------------------------------------------------------------


def _up_pressure_io_par_slip(bc, mesh, patch, internal, *, phi=None,
                             **ctx):
    """pressureInletOutletParSlipVelocity (reference: derived/): on
    outflow zeroGradient; on inflow the normal component comes from
    the flux while the tangential (slip) component of the interior is
    retained."""
    if phi is None:
        return bc
    sl = patch.slice
    mag = jnp.maximum(mesh.mag_sf[sl], 1e-30)
    n = mesh.sf[sl] / mag[:, None]
    ui = internal
    ui_t = ui - jnp.sum(ui * n, axis=1, keepdims=True) * n
    u_in = ui_t + (phi[sl] / mag)[:, None] * n
    f = jnp.where(phi[sl] < 0.0, 1.0, 0.0).astype(internal.dtype)
    return bc.replace(ref_value=u_in, vfrac=f)


pf.register_value_coeffs("maxwellSlipU", _vc_mixed)
pf.register_value_coeffs("smoluchowskiJumpT", _vc_mixed)
pf.register_value_coeffs("fixedRho", _vc_mixed)
pf.register_value_coeffs("fanPressure", _vc_mixed)
pf.register_value_coeffs("syringePressure", _vc_mixed)
pf.register_value_coeffs("pressureInletOutletParSlipVelocity",
                         _vc_mixed)

pf.register_update("maxwellSlipU", _up_maxwell_slip_u)
pf.register_update("smoluchowskiJumpT", _up_smoluchowski_jump_t)
pf.register_update("fixedRho", _up_fixed_rho)
pf.register_update("fanPressure", _up_fan_pressure)
pf.register_update("syringePressure", _up_syringe_pressure)
pf.register_update("pressureInletOutletParSlipVelocity",
                   _up_pressure_io_par_slip)
