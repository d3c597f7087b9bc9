"""fvm — implicit finite-volume operators (return FvMatrix).

Rebuild of reference: src/finiteVolume/finiteVolume/fvm/ plus the
scheme implementations (EulerDdtScheme, gaussConvectionScheme,
gaussLaplacianScheme — reference:
src/finiteVolume/finiteVolume/ddtSchemes/EulerDdtScheme/,
convectionSchemes/gaussConvectionScheme/,
laplacianSchemes/gaussLaplacianScheme/).

Matrix row convention: see ops/matrix.py. Off-diagonal coefficients are
derived exactly as the reference's assembly + negSumDiag:

  convection (face flux phi, owner weight w):
      upper = phi*(1-w); lower = -phi*w
      diag[own] += phi*w;  diag[nei] -= phi*(1-w)
  diffusion (coef = gamma_f |Sf| deltaCoeff):
      upper = lower = coef;  diag[own] -= coef; diag[nei] -= coef
      (note: that sign pair makes fvm.laplacian the NEGATIVE-definite
       operator, as in the reference; equations use -fvm.laplacian or
       rely on the operator algebra)

Boundary faces fold the BC linearisation vf = vic*psi_c + vbc,
snGrad = gic*psi_c + gbc into internalCoeffs (ic, added to the diag at
solve time) and boundaryCoeffs (bc, added to the source).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from ..bc import patchfields as pf
from ..core.dimensions import DimensionSet, dimTime, dimVolume
from ..core.fields import VolField
from . import fvc, surface
from .matrix import FvMatrix, zero_matrix


def _ncmp(field: VolField) -> int:
    return 1 if field.data.ndim == 1 else field.data.shape[1]


def _colv(x, field_data):
    return x[:, None] if field_data.ndim == 2 else x


def ddt(mesh, field: VolField, old_data: Any, rdt: Any) -> FvMatrix:
    """Euler implicit d/dt (reference: EulerDdtScheme::fvmDdt):
    diag = V/dt, source = V/dt * psi_old."""
    m = zero_matrix(mesh, _ncmp(field), dims=field.dims * dimVolume / dimTime)
    vdt = mesh.v * rdt
    return m.replace_fields(
        diag=vdt,
        source=_colv(vdt, field.data) * old_data,
    )


def ddt_steady(mesh, field: VolField) -> FvMatrix:
    """steadyState ddt: zero contribution."""
    return zero_matrix(mesh, _ncmp(field), dims=field.dims * dimVolume / dimTime)


def d2dt2(mesh, field: VolField, old: Any, old_old: Any, rdt: Any
          ) -> FvMatrix:
    """Euler implicit d2/dt2 (reference: EulerD2dt2Scheme::fvmD2dt2):
    diag = V/dt^2, source = V/dt^2 * (2 psi0 - psi00)."""
    m = zero_matrix(mesh, _ncmp(field),
                    dims=field.dims * dimVolume / (dimTime * dimTime))
    vdt2 = mesh.v * rdt * rdt
    return m.replace_fields(
        diag=vdt2,
        source=_colv(vdt2, field.data) * (2.0 * old - old_old),
    )


def ddt_backward(mesh, field: VolField, old: Any, old_old: Any,
                 rdt: Any, rdt0: Any) -> FvMatrix:
    """Second-order backward (BDF2) implicit d/dt (reference:
    ddtSchemes/backwardDdtScheme/backwardDdtScheme.C), variable-dt
    coefficients:
        coefft   = 1 + dt/(dt+dt0)
        coefft00 = dt^2 / (dt0 (dt+dt0))
        coefft0  = coefft + coefft00
        diag = coefft V/dt;  source = V/dt (coefft0 old - coefft00 old_old)
    First step: initialise dt0 huge (reference: deltaT0_ = GREAT when
    oldTime.oldTime is unset) -> coefft -> 1, coefft00 -> 0 = Euler."""
    dt = 1.0 / rdt
    dt0 = 1.0 / jnp.maximum(rdt0, 1e-30)
    coefft = 1.0 + dt / (dt + dt0)
    coefft00 = dt * dt / (dt0 * (dt + dt0))
    coefft0 = coefft + coefft00
    m = zero_matrix(mesh, _ncmp(field), dims=field.dims * dimVolume / dimTime)
    vdt = mesh.v * rdt
    vdt_c = _colv(vdt, field.data)
    return m.replace_fields(
        diag=coefft * vdt,
        source=vdt_c * (coefft0 * old - coefft00 * old_old),
    )


def _cn_active(oc: float, rdt0: Any) -> Any:
    """Reference CrankNicolsonDdtScheme::coef_: the off-centre term is
    active only AFTER the first step (ddt0 undefined at startup -> the
    first step runs as pure Euler). rdt0 <= tiny marks startup."""
    if rdt0 is None:
        return oc
    return oc * jnp.where(jnp.asarray(rdt0) > 1e-20, 1.0, 0.0)


def ddt_crank_nicolson(mesh, field: VolField, old: Any, ddt0: Any,
                       rdt: Any, oc: float = 1.0,
                       rdt0: Any = None) -> FvMatrix:
    """Crank-Nicolson implicit d/dt (reference: ddtSchemes/
    CrankNicolsonDdtScheme/, 2.2 convention: the dict coefficient oc in
    [0,1] blends Euler (0) to pure CN (1)):
        ddt(psi) = (1+oc)(psi - old)/dt - oc*ddt0
    where ddt0 is the PREVIOUS step's ddt, updated after the solve via
    ddt_cn_update; the caller carries ddt0 (and rdt0, the previous
    step's 1/dt, tiny at startup) in the solver state."""
    oc_eff = _cn_active(oc, rdt0)
    m = zero_matrix(mesh, _ncmp(field), dims=field.dims * dimVolume / dimTime)
    rc = (1.0 + oc_eff) * rdt
    vrc = mesh.v * rc
    vrc_c = _colv(vrc, field.data)
    v_c = _colv(mesh.v, field.data)
    return m.replace_fields(
        diag=vrc,
        source=vrc_c * old + oc_eff * v_c * ddt0,
    )


def ddt_cn_update(new: Any, old: Any, ddt0: Any, rdt: Any,
                  oc: float = 1.0, rdt0: Any = None) -> Any:
    """Advance the stored ddt0 at the END of a CN step (reference:
    DDt0Field evaluation): ddt0 <- (1+oc')*rdt*(new-old) - oc'*ddt0
    with oc' gated off on the startup step (matching the matrix)."""
    oc_eff = _cn_active(oc, rdt0)
    return (1.0 + oc_eff) * rdt * (new - old) - oc_eff * ddt0


def div(
    mesh,
    phi: Any,
    field: VolField,
    weights: Optional[Any] = None,
    phi_dims: Optional[DimensionSet] = None,
    phi_slot: Any = None,
    slot_weights: Any = None,
) -> FvMatrix:
    """Implicit Gauss convection div(phi, psi)
    (reference: gaussConvectionScheme::fvmDiv). `weights` are owner-side
    interpolation weights on internal faces (from ops.schemes; default
    linear).

    Fast path: when `phi_slot` (ops/slot.py SlotFace of the flux) is
    given, the diagonal and the slot off-diagonal coefficients assemble
    elementwise over [nC,M] — zero gathers. `slot_weights` =
    (wself [nC,M], fb_wself [nfb]) self-side scheme weights (default:
    linear, mesh.st_wself)."""
    from ..core.dimensions import dimFlux
    from . import slot as slot_mod

    nif = mesh.n_internal_faces
    act = mesh.face_active
    phi_i = phi[:nif]

    soff = sfb = None
    if phi_slot is not None:
        if slot_weights is None:
            wself, fb_wself = mesh.st_wself, mesh.fb_wself
        else:
            wself, fb_wself = slot_weights
        phi_out = mesh.st_sign * phi_slot.sv
        soff = phi_out * (1.0 - wself) * mesh.st_valid
        sdiagc = phi_out * wself * mesh.st_valid
        diag = jnp.sum(sdiagc, axis=1)
        if mesh.fb_cells.shape[0]:
            phi_ofb = mesh.fb_signs * phi_slot.fb
            sfb = phi_ofb * (1.0 - fb_wself)
            diag = diag.at[mesh.fb_cells].add(phi_ofb * fb_wself)
        else:
            sfb = jnp.zeros((0,), diag.dtype)
        if weights is None and slot_weights is not None:
            weights = slot_mod.to_flat_internal(
                mesh, slot_mod.SlotFace(wself, fb_wself))
        w = mesh.weights[:nif] if weights is None else weights
        lower = -phi_i * w
        upper = phi_i * (1.0 - w)
    else:
        w = mesh.weights[:nif] if weights is None else weights
        lower = -phi_i * w
        upper = phi_i * (1.0 - w)
        # negSumDiag in gather form: diag[own] -= lower; diag[nei] -= upper
        own_side = jnp.where(mesh.csign > 0, lower[mesh.cface_i],
                             upper[mesh.cface_i])
        diag = -jnp.sum(own_side * mesh.cnbr_valid, axis=1)

    # boundary: term phi_b * (vic*psi_c + vbc)
    ics, bcs = [], []
    for p, bc in zip(mesh.patches, field.bcs):
        phib = (phi * act)[p.slice]
        vic, vbc = pf.value_coeffs(bc, mesh, p, field.data)
        phib_c = _colv(phib, field.data)
        ics.append(phib_c * vic)
        bcs.append(-phib_c * vbc)
    ic = jnp.concatenate(ics, axis=0)
    bcc = jnp.concatenate(bcs, axis=0)

    dims = (phi_dims or dimFlux) * field.dims
    nc = _ncmp(field)
    src = jnp.zeros((mesh.n_cells,) if nc == 1 else (mesh.n_cells, nc), diag.dtype)
    return FvMatrix(
        diag=diag, lower=lower, upper=upper, source=src, ic=ic, bc=bcc,
        soff=soff, sfb=sfb, dims=dims, symmetric=False,
    )


def laplacian_correction(mesh, gamma_f: Any, field: VolField,
                         limit: float = 1.0, coef_i: Any = None):
    """Explicit non-orthogonal deferred correction of the Gauss
    laplacian (reference: correctedSnGrad::correction). Returns
    (corr_full [nF,(C)], corr_cell [nC,(C)]) — the per-face correction
    flux (for fvMatrix::flux consistency) and its cell integral (to
    subtract from the source). Split out of laplacian() so pressure
    solvers can reuse CONSTANT matrix coefficients across correctors
    while re-evaluating only this field-dependent term."""
    nif = mesh.n_internal_faces
    act = mesh.face_active
    gamma_f = jnp.broadcast_to(jnp.asarray(gamma_f, mesh.v.dtype),
                               (mesh.n_faces,))
    g = fvc.grad(mesh, field)
    gf = surface.interpolate_internal(mesh, g)
    gamsf_i = (gamma_f * mesh.mag_sf * act)[:nif]
    if field.data.ndim == 1:
        corr_f = gamsf_i * jnp.sum(mesh.correction_vecs[:nif] * gf, axis=1)
    else:
        corr_f = gamsf_i[:, None] * jnp.sum(
            mesh.correction_vecs[:nif, :, None] * gf, axis=1
        )
    if limit < 1.0:
        if coef_i is None:
            coef_i = (gamma_f * mesh.mag_sf * act
                      * mesh.non_orth_delta_coeffs)[:nif]
        d = surface.delta(mesh, field.data)
        orth = coef_i[:, None] * d if d.ndim == 2 else coef_i * d
        cap = (limit / (1.0 - limit)) * jnp.abs(orth)
        corr_f = jnp.clip(corr_f, -cap, cap)
    if corr_f.ndim == 2:
        corr_full = jnp.zeros((mesh.n_faces, corr_f.shape[1]), corr_f.dtype)
    else:
        corr_full = jnp.zeros((mesh.n_faces,), corr_f.dtype)
    corr_full = corr_full.at[:nif].set(corr_f)
    corr_cell = surface.surface_sum(mesh, corr_full)
    return corr_full, corr_cell


def laplacian(
    mesh,
    gamma_f: Any,
    field: VolField,
    corrected: bool = True,
    gamma_dims: Optional[DimensionSet] = None,
    limit: float = 1.0,
    defer_correction: bool = False,
    gamma_slot: Any = None,
) -> FvMatrix:
    """Implicit Gauss Laplacian laplacian(gamma, psi)
    (reference: gaussLaplacianScheme::fvmLaplacian). gamma_f is a face
    field [nF] (interpolate cell gamma first) or a scalar.

    corrected=True adds the explicit non-orthogonality correction to the
    source (reference: correctedSnGrad deferred correction).
    limit < 1 clips the correction magnitude to
    limit/(1-limit) * |orthogonal part| per face (reference:
    snGradSchemes/limitedSnGrad — 'limited corrected <c>')."""
    from ..core.dimensions import dimless

    if corrected and getattr(mesh, "orthogonal", False):
        # the correction is identically zero on an orthogonal mesh (and
        # non_orth_delta_coeffs == delta_coeffs); skip it at trace time
        corrected = False
    nif = mesh.n_internal_faces
    act = mesh.face_active
    gamma_scalar = jnp.ndim(gamma_f) == 0
    gamma_f = jnp.broadcast_to(jnp.asarray(gamma_f, mesh.v.dtype), (mesh.n_faces,))
    dc = mesh.non_orth_delta_coeffs if corrected else mesh.delta_coeffs
    coef = gamma_f * mesh.mag_sf * act * dc
    coef_i = coef[:nif]

    upper = coef_i
    lower = coef_i
    if gamma_slot is not None or gamma_scalar:
        # slot fast path (elementwise, zero gathers; internal faces are
        # never empty-masked so face_active is not needed here)
        dcs = mesh.st_nodc if corrected else mesh.st_dc
        dcf = mesh.fb_nodc if corrected else mesh.fb_dc
        if gamma_scalar:
            g_sv = gamma_f[0]
            g_fb = gamma_f[0]
        else:
            g_sv, g_fb = gamma_slot.sv, gamma_slot.fb
        soff = g_sv * mesh.st_magsf * dcs * mesh.st_valid
        diag = -jnp.sum(soff, axis=1)
        if mesh.fb_cells.shape[0]:
            sfb = g_fb * mesh.fb_magsf * dcf
            diag = diag.at[mesh.fb_cells].add(-sfb)
        else:
            sfb = jnp.zeros((0,), diag.dtype)
    else:
        soff = sfb = None
        diag = -jnp.sum(coef_i[mesh.cface_i] * mesh.cnbr_valid, axis=1)

    nc = _ncmp(field)
    src = jnp.zeros((mesh.n_cells,) if nc == 1 else (mesh.n_cells, nc), diag.dtype)
    fcorr = None
    if corrected and not defer_correction:
        corr_full, corr_cell = laplacian_correction(
            mesh, gamma_f, field, limit=limit, coef_i=coef_i
        )
        # fvm terms sit on the LHS with the matrix representing the full
        # operator, so the explicit part moves to the source with a
        # MINUS sign relative to the implicit part:
        src = src - corr_cell
        # stash the per-face correction so fvMatrix::flux stays
        # consistent with the solved operator on non-orthogonal meshes
        # (reference: faceFluxCorrectionPtr_; ADVICE.md r1 #4)
        fcorr = corr_full

    gb = gamma_f * mesh.mag_sf * act
    ics, bcs = [], []
    ami_coef = None
    for p, bc in zip(mesh.patches, field.bcs):
        if bc.kind in ("cyclicAMI",) + pf._JUMP_KINDS:
            # IMPLICIT coupled-interface diffusion: own side on the
            # diagonal here, the interpolated-neighbour off-diagonal
            # rides the matrix ami_coef through every matvec
            # (reference: cyclicAMIFvPatchField::updateInterfaceMatrix).
            # jumpCyclic kinds (fixedJump/fan) add the constant jump
            # through the boundary source: coupled snGrad is
            # dc*(nbr + jump - own), so gbc_jump = dc*jump
            # (reference: jumpCyclicFvPatchField::updateInterfaceMatrix
            # subtracting jump from the neighbour contribution).
            dcp = dc[p.slice]
            gbp = _colv(gb[p.slice], field.data)
            dcp_c = _colv(dcp, field.data)
            shape = (p.size,) + field.data.shape[1:]
            ics.append(jnp.broadcast_to(gbp * (-dcp_c), shape))
            if bc.kind in pf._JUMP_KINDS:
                j = pf.jump_signed(bc, jnp.zeros(shape, diag.dtype))
                bcs.append(-gbp * dcp_c * j)
            else:
                bcs.append(jnp.zeros(shape, diag.dtype))
            if ami_coef is None:
                ami_coef = jnp.zeros(mesh.n_faces - nif, diag.dtype)
            rel = p.start - nif
            ami_coef = ami_coef.at[rel:rel + p.size].set(
                (gb * dc)[p.slice])
            continue
        gic, gbc = pf.grad_coeffs(bc, mesh, p, field.data)
        gbp = _colv(gb[p.slice], field.data)
        ics.append(gbp * gic)
        bcs.append(-gbp * gbc)
    ic = jnp.concatenate(ics, axis=0)
    bcc = jnp.concatenate(bcs, axis=0)

    gdims = gamma_dims if gamma_dims is not None else dimless
    from ..core.dimensions import dimLength

    dims = gdims * field.dims * dimLength
    return FvMatrix(
        diag=diag, lower=lower, upper=upper, source=src, ic=ic, bc=bcc,
        fcorr=fcorr, soff=soff, sfb=sfb, ami_coef=ami_coef, dims=dims,
        symmetric=True,
    )


def Sp(mesh, sp: Any, field: VolField, sp_dims=None) -> FvMatrix:
    """Implicit source sp*psi (reference: fvm::Sp): diag += V*sp.
    sp_dims: dimensions of sp (default 1/s, the plain rate)."""
    from ..core.dimensions import DimensionSet

    d = (DimensionSet.of(0, 0, -1) if sp_dims is None else sp_dims)
    m = zero_matrix(mesh, _ncmp(field), dims=field.dims * dimVolume * d)
    return m.replace_fields(diag=mesh.v * sp)


def SuSp(mesh, susp: Any, field: VolField, susp_dims=None) -> FvMatrix:
    """Implicit/explicit split source (reference: fvm::SuSp): the
    positive part goes on the diagonal (stabilising), the negative part
    is explicit. susp_dims: dimensions of susp (default 1/s)."""
    from ..core.dimensions import DimensionSet

    d = (DimensionSet.of(0, 0, -1) if susp_dims is None else susp_dims)
    m = zero_matrix(mesh, _ncmp(field), dims=field.dims * dimVolume * d)
    diag = mesh.v * jnp.maximum(susp, 0.0)
    src = -_colv(mesh.v * jnp.minimum(susp, 0.0), field.data) * field.data
    return m.replace_fields(diag=diag, source=src)


def Su(mesh, su: Any, field: VolField) -> FvMatrix:
    """Explicit source inside the operator (reference: fvm::Su):
    source -= V*su (the term appears on the LHS)."""
    m = zero_matrix(mesh, _ncmp(field), dims=field.dims * dimVolume / dimTime)
    v = _colv(mesh.v, field.data)
    return m.replace_fields(source=-v * su)
