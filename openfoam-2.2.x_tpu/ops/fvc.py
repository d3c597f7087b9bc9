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
    g[c,i,j] = d(u_j)/d(x_i) (reference: gaussGrad). Computed on the
    slot layout (ops/slot.py) — rolls instead of gathers."""
    from . import slot as slot_mod

    bv = field.boundary_values(mesh)
    return slot_mod.grad(mesh, field.data, bv)


def grad_least_squares(mesh, field: VolField) -> Any:
    """Least-squares gradient (reference:
    src/finiteVolume/finiteVolume/gradSchemes/leastSquaresGrad/):
    inverse-distance-squared weighted fit over face neighbours plus
    boundary faces. Exact for linear fields on ANY mesh (Gauss linear
    is only exact on uniform meshes). scalar -> [nC,3];
    vector -> [nC,3,3] with g[c,i,j] = d(u_j)/d(x_i)."""
    data = field.data
    c = mesh.c
    tiny = 1e-30
    vec = data.ndim == 2

    # internal neighbours via the cell tables
    valid = mesh.cnbr_valid                          # [nC,K]
    d = (c[mesh.cnbr] - c[:, None, :]) * valid[:, :, None]
    w2 = valid / jnp.maximum(jnp.sum(d * d, axis=2), tiny)
    G = jnp.sum(w2[:, :, None, None] * d[:, :, :, None] * d[:, :, None, :],
                axis=1)                              # [nC,3,3]
    dpsi = data[mesh.cnbr] - data[:, None]           # [nC,K(,C)]
    if vec:
        rhs = jnp.sum((w2[:, :, None] * d)[:, :, :, None]
                      * dpsi[:, :, None, :], axis=1)  # [nC,3,C]
    else:
        rhs = jnp.sum(w2[:, :, None] * d * dpsi[:, :, None], axis=1)

    # boundary faces: d = Cf - C(own), value from the BC
    nif = mesh.n_internal_faces
    act = mesh.face_active
    for p, bc in zip(mesh.patches, field.bcs):
        cells = mesh.owner[p.slice]
        a = act[p.slice]
        db = (mesh.cf[p.slice] - c[cells]) * a[:, None]
        w2b = a / jnp.maximum(jnp.sum(db * db, axis=1), tiny)
        vb = pf.evaluate(bc, mesh, p, data)
        dvb = vb - data[cells]
        Gb = w2b[:, None, None] * db[:, :, None] * db[:, None, :]
        G = G.at[cells].add(Gb)
        if vec:
            rb = (w2b[:, None] * db)[:, :, None] * dvb[:, None, :]
        else:
            rb = w2b[:, None] * db * dvb[:, None]
        rhs = rhs.at[cells].add(rb)

    # regularise null directions (2D empty-masked meshes: z row/col is
    # exactly zero with a zero rhs -> clean 0 gradient, not NaN)
    tr = jnp.trace(G, axis1=1, axis2=2)
    eps = (1e-9 * tr + tiny)[:, None, None] * jnp.eye(3, dtype=G.dtype)
    if vec:
        return jnp.linalg.solve(G + eps, rhs)
    return jnp.linalg.solve(G + eps, rhs[..., None])[..., 0]


def grad_cell_limited(mesh, field: VolField, g: Any, k: float) -> Any:
    """cellLimited gradient limiter (reference: gradSchemes/
    limitedGradSchemes/cellLimitedGrad/): scale each cell's gradient so
    face-extrapolated values stay within the min/max over the cell's
    neighbours (and boundary faces). k in (0,1]; k=1 = full limiting."""
    data = field.data
    vec = data.ndim == 2
    big = jnp.asarray(1e30, data.dtype)
    valid = mesh.cnbr_valid                           # [nC,K]
    vn = data[mesh.cnbr]                              # [nC,K(,C)]
    if vec:
        vmask = valid[:, :, None]
        vmax = jnp.max(jnp.where(vmask > 0, vn, -big), axis=1)
        vmin = jnp.min(jnp.where(vmask > 0, vn, big), axis=1)
    else:
        vmax = jnp.max(jnp.where(valid > 0, vn, -big), axis=1)
        vmin = jnp.min(jnp.where(valid > 0, vn, big), axis=1)
    # boundary face values extend the extrema (reference includes
    # boundary patch neighbour-field values)
    act = mesh.face_active
    for p, bc in zip(mesh.patches, field.bcs):
        cells = mesh.owner[p.slice]
        a = act[p.slice]
        vb = pf.evaluate(bc, mesh, p, data)
        if vec:
            vb_hi = jnp.where(a[:, None] > 0, vb, -big)
            vb_lo = jnp.where(a[:, None] > 0, vb, big)
        else:
            vb_hi = jnp.where(a > 0, vb, -big)
            vb_lo = jnp.where(a > 0, vb, big)
        vmax = vmax.at[cells].max(vb_hi)
        vmin = vmin.at[cells].min(vb_lo)

    max_d = vmax - data
    min_d = vmin - data
    if k < 1.0:
        rk = (1.0 / max(k, 1e-3) - 1.0)
        span = rk * (max_d - min_d)
        max_d = max_d + span
        min_d = min_d - span

    # extrapolation to every face of the cell (incl. boundary faces)
    pres = jnp.abs(mesh.csign)                        # [nC,K] presence
    rvec = (mesh.cf[mesh.cface] - mesh.c[:, None, :]) * pres[:, :, None]
    if vec:
        ext = jnp.einsum("cki,cij->ckj", rvec, g)     # [nC,K,C]
        md, nd = max_d[:, None, :], min_d[:, None, :]
        pm = pres[:, :, None]
    else:
        ext = jnp.sum(rvec * g[:, None, :], axis=2)   # [nC,K]
        md, nd = max_d[:, None], min_d[:, None]
        pm = pres
    tinyx = 1e-30
    lim_hi = jnp.where(ext > md + tinyx, md / jnp.maximum(ext, tinyx), 1.0)
    lim_lo = jnp.where(ext < nd - tinyx, nd / jnp.minimum(ext, -tinyx), 1.0)
    lim = jnp.clip(jnp.minimum(lim_hi, lim_lo), 0.0, 1.0)
    lim = jnp.where(pm > 0, lim, 1.0)
    limiter = jnp.min(lim, axis=1)                    # [nC(,C)]
    if vec:
        return g * limiter[:, None, :]
    return g * limiter[:, None]


def grad_of(mesh, field: VolField, scheme: str = "Gauss linear") -> Any:
    """Gradient dispatch by fvSchemes keyword (reference:
    gradScheme::New). Supported: 'Gauss linear', 'leastSquares',
    'cellLimited <base...> <k>', 'faceLimited ...' (mapped to
    cellLimited — documented approximation)."""
    toks = str(scheme).split()
    if not toks or toks == ["linear"]:
        return grad(mesh, field)
    if toks[0] in ("cellLimited", "faceLimited"):
        k = float(toks[-1])
        base = " ".join(toks[1:-1]) or "Gauss linear"
        g = grad_of(mesh, field, base)
        return grad_cell_limited(mesh, field, g, k)
    if toks[0] == "leastSquares":
        return grad_least_squares(mesh, field)
    if toks[0] == "Gauss":
        return grad(mesh, field)
    raise ValueError(f"unknown gradScheme {scheme!r}")


def grad_component(mesh, data: Any, bvals: Any) -> Any:
    """Gauss gradient of raw per-cell scalar data with given boundary
    face values (used inside solvers for lagged corrections)."""
    from . import slot as slot_mod

    return slot_mod.grad(mesh, data, bvals)


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


def curl(mesh, field: VolField) -> Any:
    """fvc::curl(U) [nC,3] from the Gauss gradient: curl_i =
    eps_ijk d(u_k)/d(x_j) (reference: fvcCurl.C — 2*skew(grad U))."""
    g = grad(mesh, field)   # g[c,i,j] = d(u_j)/d(x_i)
    return jnp.stack([g[:, 1, 2] - g[:, 2, 1],
                      g[:, 2, 0] - g[:, 0, 2],
                      g[:, 0, 1] - g[:, 1, 0]], axis=1)
