"""fvc — explicit finite-volume operators (return fields).

Rebuild of reference: src/finiteVolume/finiteVolume/fvc/ (fvcGrad,
fvcDiv, fvcSnGrad, fvcFlux, fvcSurfaceIntegrate, fvcLaplacian, ...).
All functions are pure, jit-traceable, gather-based.

Conventions:
- `mesh` is an FvMesh pytree; `field` a VolField; face arrays are flat
  [nF,(3)] covering internal then boundary faces.
- Empty-patch faces are masked out via mesh.face_active (the reference
  skips empty patches entirely), which makes 2D extruded meshes exact.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from ..bc import patchfields as pf
from ..core.fields import VolField
from . import surface


def interpolate(mesh, field: VolField, weights: Optional[Any] = None) -> Any:
    """Cell -> face interpolation (linear by default). [nF,(3)]."""
    return surface.face_values(mesh, field, weights)


def surface_integrate(mesh, face_vals: Any) -> Any:
    """(1/V) * sum_f sign_f face_vals_f (reference: fvc::surfaceIntegrate)."""
    s = surface.surface_sum(mesh, face_vals)
    if s.ndim == 2:
        return s / mesh.v[:, None]
    return s / mesh.v


def div_surface(mesh, phi: Any) -> Any:
    """fvc::div(phi) for a face flux [nF] -> [nC]."""
    return surface_integrate(mesh, phi * mesh.face_active)


def div(mesh, phi: Any, field: VolField, weights: Optional[Any] = None) -> Any:
    """Gauss divergence of phi*field -> [nC,(3)]
    (reference: gaussConvectionScheme::fvcDiv)."""
    vf = interpolate(mesh, field, weights)
    if vf.ndim == 2:
        return surface_integrate(mesh, phi[:, None] * vf * mesh.face_active[:, None])
    return surface_integrate(mesh, phi * vf * mesh.face_active)


def grad(mesh, field: VolField) -> Any:
    """Gauss gradient. scalar -> [nC,3]; vector -> [nC,3,3] with
    g[c,i,j] = d(u_j)/d(x_i) (reference: gaussGrad)."""
    vf = interpolate(mesh, field)
    sf = mesh.sf * mesh.face_active[:, None]
    if vf.ndim == 1:
        g = surface.surface_sum(mesh, sf * vf[:, None])
        return g / mesh.v[:, None]
    # outer product Sf_i * vf_j
    prod = sf[:, :, None] * vf[:, None, :]  # [nF,3,3]
    gathered = prod[mesh.cface]             # [nC,K,3,3]
    g = jnp.sum(gathered * mesh.csign[:, :, None, None], axis=1)
    return g / mesh.v[:, None, None]


def grad_component(mesh, data: Any, bvals: Any) -> Any:
    """Gauss gradient of raw per-cell scalar data with given boundary
    face values (used inside solvers for lagged corrections)."""
    vi = surface.interpolate_internal(mesh, data)
    vf = jnp.concatenate([vi, bvals], axis=0)
    sf = mesh.sf * mesh.face_active[:, None]
    g = surface.surface_sum(mesh, sf * vf[:, None])
    return g / mesh.v[:, None]


def sn_grad(mesh, field: VolField, corrected: bool = False) -> Any:
    """Face-normal gradient [nF,(3)]: orthogonal part + optional
    explicit non-orthogonality correction
    (reference: snGradScheme / correctedSnGrad)."""
    nif = mesh.n_internal_faces
    d = surface.delta(mesh, field.data)
    dc = mesh.delta_coeffs if not corrected else mesh.non_orth_delta_coeffs
    dci = dc[:nif]
    sng_i = d * (dci[:, None] if d.ndim == 2 else dci)
    if corrected:
        g = grad(mesh, field)  # [nC,3] or [nC,3,3]
        if field.data.ndim == 1:
            gf = surface.interpolate_internal(mesh, g)  # [nIf,3]
            corr = jnp.sum(mesh.correction_vecs[:nif] * gf, axis=1)
        else:
            gf = surface.interpolate_internal(mesh, g)  # [nIf,3,3]
            corr = jnp.sum(mesh.correction_vecs[:nif, :, None] * gf, axis=1)
        sng_i = sng_i + corr
    # boundary snGrad from BC gradient coefficients
    sng_b = []
    for p, bc in zip(mesh.patches, field.bcs):
        gic, gbc = pf.grad_coeffs(bc, mesh, p, field.data)
        vi = field.data[mesh.owner[p.slice]]
        sng_b.append(gic * vi + gbc)
    if sng_b:
        return jnp.concatenate([sng_i] + sng_b, axis=0)
    return sng_i


def flux(mesh, field: VolField) -> Any:
    """Face flux of a vector field: phi = Sf . interp(U), masked on
    empty patches (reference: fvc::flux / surfaceInterpolation)."""
    uf = interpolate(mesh, field)
    return jnp.sum(mesh.sf * uf, axis=1) * mesh.face_active


def laplacian(mesh, gamma_f: Any, field: VolField, corrected: bool = True) -> Any:
    """Explicit Laplacian: surfaceIntegrate(gamma_f |Sf| snGrad)."""
    sng = sn_grad(mesh, field, corrected=corrected)
    coef = gamma_f * mesh.mag_sf * mesh.face_active
    if sng.ndim == 2:
        return surface_integrate(mesh, coef[:, None] * sng)
    return surface_integrate(mesh, coef * sng)


def average(mesh, face_vals: Any) -> Any:
    """Face -> cell average weighted by |face count| (reference:
    fvc::average uses unweighted patch sums; we use arithmetic mean)."""
    ones = jnp.abs(mesh.csign)
    if face_vals.ndim == 2:
        s = jnp.sum(face_vals[mesh.cface] * ones[:, :, None], axis=1)
        return s / jnp.sum(ones, axis=1)[:, None]
    s = jnp.sum(face_vals[mesh.cface] * ones, axis=1)
    return s / jnp.sum(ones, axis=1)


def reconstruct(mesh, phi: Any) -> Any:
    """Reconstruct a cell vector field from face fluxes
    (reference: fvc::reconstruct): (sum Sf ⊗ Sf/|Sf| )^-1 . sum (Sf phi/|Sf|)."""
    sf = mesh.sf * mesh.face_active[:, None]
    w = 1.0 / jnp.maximum(mesh.mag_sf, 1e-30)
    # per-cell 3x3: sum_f sign^2 * Sf Sf^T / |Sf|  (sign^2 = presence)
    pres = jnp.abs(mesh.csign)
    outer = (sf[:, :, None] * sf[:, None, :]) * w[:, None, None]
    Gsum = jnp.sum(outer[mesh.cface] * pres[:, :, None, None], axis=1)
    rhs_f = sf * (phi * w)[:, None]
    rhs = jnp.sum(rhs_f[mesh.cface] * pres[:, :, None], axis=1)
    # regularise null directions (2D meshes: empty faces are masked so
    # the z-z entry is exactly zero; the corresponding rhs is zero too,
    # giving a clean 0 component instead of NaN)
    tr = jnp.trace(Gsum, axis1=1, axis2=2)
    eps = (1e-6 * tr + 1e-300)[:, None, None] * jnp.eye(3, dtype=Gsum.dtype)
    return jnp.linalg.solve(Gsum + eps, rhs[..., None])[..., 0]


def ddt(mesh, data: Any, old_data: Any, rdt: Any) -> Any:
    return (data - old_data) * rdt


def domain_integrate(mesh, data: Any) -> Any:
    if data.ndim == 2:
        return jnp.sum(data * mesh.v[:, None], axis=0)
    return jnp.sum(data * mesh.v)
