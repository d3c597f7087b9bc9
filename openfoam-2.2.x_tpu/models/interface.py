"""VOF interface properties: surface tension + interface compression.

Reference: src/transportModels/interfaceProperties/ — curvature via the
CSF model (Brackbill): kappa = -div(n_f) with n_f the interpolated,
normalised alpha gradient; the interface-compression flux phir uses
cAlpha (reference: interfaceProperties::correct and the phir term in
interFoam's alphaEqn.H)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from ..core.fields import VolField
from ..ops import fvc, surface


def _correct_contact_angle(mesh, alpha: VolField, nhat, U=None):
    """Rotate the boundary interface normals of wall patches whose
    alpha BC is an alphaContactAngle kind so that nHat . n_wall =
    cos(theta) (reference: twoPhaseInterfaceProperties/
    interfaceProperties::correctContactAngle — the a/b rotation in the
    (nHat, n_wall) plane). Constant theta0 is exact; when the BC
    carries uTheta/thetaA/thetaR and the carrier velocity is supplied,
    the velocity-dependent dynamic angle
        theta = theta0 + (thetaA - thetaR) * tanh(u_wall / uTheta)
    is used, with u_wall the wall-tangential fluid speed resolved along
    the wall-projected interface normal (reference:
    dynamicAlphaContactAngleFvPatchScalarField::theta)."""
    if not any(bc.kind == "alphaContactAngle" for bc in alpha.bcs):
        return nhat
    from ..bc.patchfields import evaluate as bc_evaluate
    for i, (p, bc) in enumerate(zip(mesh.patches, alpha.bcs)):
        if bc.kind != "alphaContactAngle":
            continue
        theta0 = float(bc.opt("theta0", jnp.pi / 2))
        u_theta = float(bc.opt("uTheta", 0.0) or 0.0)
        sl = p.slice
        nf = mesh.sf[sl] / jnp.maximum(mesh.mag_sf[sl], 1e-30)[:, None]
        nhatp = nhat[sl]
        if U is not None and u_theta > 0.0:
            u_wall_bc = bc_evaluate(U.bcs[i], mesh, p, U.data)
            u_rel = U.data[mesh.owner[sl]] - u_wall_bc
            u_rel = u_rel - jnp.sum(u_rel * nf, axis=1)[:, None] * nf
            n_wall = nhatp - jnp.sum(nhatp * nf, axis=1)[:, None] * nf
            n_wall = n_wall / (jnp.linalg.norm(n_wall, axis=1)
                               + 1e-30)[:, None]
            uw = jnp.sum(n_wall * u_rel, axis=1)
            theta_a = float(bc.opt("thetaA", theta0))
            theta_r = float(bc.opt("thetaR", theta0))
            theta = theta0 + (theta_a - theta_r) * jnp.tanh(uw / u_theta)
        else:
            theta = theta0
        a12 = jnp.clip(jnp.sum(nhatp * nf, axis=1), -1 + 1e-6,
                       1 - 1e-6)
        b1 = jnp.cos(theta) * jnp.ones_like(a12)
        b2 = jnp.cos(jnp.arccos(a12) - theta)
        det = 1.0 - a12 * a12
        a = (b1 - a12 * b2) / det
        b = (b2 - a12 * b1) / det
        corr = a[:, None] * nf + b[:, None] * nhatp
        corr = corr / jnp.maximum(
            jnp.linalg.norm(corr, axis=1), 1e-30)[:, None]
        nhat = nhat.at[sl].set(corr)
    return nhat


def interface_normals(mesh, alpha: VolField, U=None):
    """Face unit normal flux nHatf = (grad alpha)_f . Sf / |grad alpha|_f."""
    g = fvc.grad(mesh, alpha)  # [nC,3]
    gf = surface.interpolate_internal(mesh, g)
    gf_all = jnp.concatenate([gf, surface.owner_to_b(mesh, g)], axis=0)
    # deltaN stabiliser: 1e-8 / average cell dimension (reference:
    # interfaceProperties deltaN_)
    delta_n = 1e-8 / jnp.mean(jnp.cbrt(mesh.v))
    mag = jnp.linalg.norm(gf_all, axis=1) + delta_n
    nhat = gf_all / mag[:, None]
    nhat = _correct_contact_angle(mesh, alpha, nhat, U=U)
    nhatf = jnp.sum(nhat * mesh.sf, axis=1) * mesh.face_active
    return nhatf


def curvature(mesh, alpha: VolField, U=None) -> Any:
    """kappa = -div(nHat) [nC]."""
    nhatf = interface_normals(mesh, alpha, U=U)
    return -fvc.div_surface(mesh, nhatf)


def surface_tension_flux(mesh, alpha: VolField, sigma: float, U=None) -> Any:
    """sigma*kappa*snGrad(alpha)*|Sf| at faces — the face form of the
    CSF force used in interFoam's pEqn (reference: interFoam/pEqn.H)."""
    kappa = curvature(mesh, alpha, U=U)
    kf = surface.interpolate_internal(mesh, kappa)
    kf_all = jnp.concatenate([kf, surface.owner_to_b(mesh, kappa)], axis=0)
    sng = fvc.sn_grad(mesh, alpha)
    return sigma * kf_all * sng * mesh.mag_sf * mesh.face_active


def compression_flux(mesh, phi: Any, alpha: VolField, c_alpha: float,
                     U=None) -> Any:
    """phir = cAlpha*|phi|/|Sf| * nHatf — the artificial interface
    compression flux (reference: interFoam/alphaEqn.H)."""
    nhatf = interface_normals(mesh, alpha, U=U)
    phic = jnp.abs(phi) / jnp.maximum(mesh.mag_sf, 1e-30)
    # cap by the max face speed as the reference does
    phic = jnp.minimum(c_alpha * phic, jnp.max(phic))
    return phic * nhatf
