"""mhdFoam — incompressible laminar magnetohydrodynamics.

Rebuild of reference: applications/solvers/electromagnetics/mhdFoam/
(mhdFoam.C: PISO on U/p with the Lorentz force in conservative
Maxwell-stress form, an induction equation for B with the implicit
stretching term, and a magnetic "pressure" Poisson projection keeping
div(B) = 0):

    UEqn: ddt(U) + div(phi,U) - laplacian(nu,U)
            == div(phiB, 2 DBU B) - grad(DBU |B|^2)    (+ -grad p)
    BEqn: ddt(B) + div(phi,B) - laplacian(DB,B) - div(phiB,U) = 0
    pBEqn: laplacian(pB) == div(phiB);  phiB -= flux   (cleaning)

with DBU = 1/(2 mu rho), DB = 1/(mu sigma) (reference: createFields.H).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dimensions import DimensionSet, dimTime, dimViscosity
from ..core.fields import VolField
from ..ops import fvc, fvm, surface
from . import linear
from .piso import (boundary_flux, div_weights, face_interp_cell,
                   needs_reference)


class MhdConfig(NamedTuple):
    nu: float = 1e-6
    rho: float = 1.0
    mu_mag: float = 1.0       # magnetic permeability mu
    sigma_c: float = 1.0      # electrical conductivity
    n_correctors: int = 2
    n_b_correctors: int = 1
    n_non_orth: int = 0
    corrected: bool = False
    p_ref_cell: int = 0
    p_ref_value: float = 0.0
    p_controls: Dict = None
    u_controls: Dict = None
    pb_controls: Dict = None


def mhd_step(mesh, state: Dict, dt: Any, cfg: MhdConfig
             ) -> Tuple[Dict, Dict]:
    p_ctrl = cfg.p_controls or {"solver": "PCG",
                                "preconditioner": "polynomial",
                                "tolerance": 1e-7, "relTol": 0.01,
                                "maxIter": 1000}
    u_ctrl = cfg.u_controls or {"solver": "PBiCGStab", "tolerance": 1e-7,
                                "relTol": 0.0, "maxIter": 300}
    pb_ctrl = cfg.pb_controls or p_ctrl
    U: VolField = state["U"]
    p: VolField = state["p"]
    B: VolField = state["B"]
    pB: VolField = state["pB"]
    phi = state["phi"]
    phiB = state["phiB"]
    rdt = 1.0 / dt
    nif = mesh.n_internal_faces
    diag: Dict[str, Any] = {}
    DBU = 1.0 / (2.0 * cfg.mu_mag * cfg.rho)
    DB = 1.0 / (cfg.mu_mag * cfg.sigma_c)

    # ---- momentum with the Maxwell-stress Lorentz force --------------------
    w = div_weights(mesh, phi, "linear", U)
    UEqn = (fvm.ddt(mesh, U, state["U0"], rdt)
            + fvm.div(mesh, phi, U, weights=w)
            - fvm.laplacian(mesh, jnp.asarray(cfg.nu, mesh.v.dtype), U,
                            corrected=cfg.corrected,
                            gamma_dims=dimViscosity))
    lorentz = (fvc.div(mesh, phiB, B.with_data(2.0 * DBU * B.data))
               - fvc.grad_of(
                   mesh, p.with_data(
                       DBU * jnp.sum(B.data * B.data, axis=1)),
                   "Gauss linear"))
    grad_p = fvc.grad_of(mesh, p, "Gauss linear")
    Umat = UEqn.add_source(lorentz - grad_p, mesh)
    Udata, uperf = linear.solve(mesh, Umat, U.data, u_ctrl)
    U = U.with_data(Udata)
    diag["Ux"] = uperf

    # ---- PISO pressure correctors ------------------------------------------
    rA = 1.0 / UEqn.A(mesh)
    rAf = face_interp_cell(mesh, rA)
    for corr in range(cfg.n_correctors):
        HbyA = rA[:, None] * (UEqn.H(mesh, U.data) + lorentz)
        hf = surface.interpolate_internal(mesh, HbyA)
        phiHbyA_i = jnp.sum(mesh.sf[:nif] * hf, axis=1) \
            * mesh.face_active[:nif]
        phiHbyA = jnp.concatenate(
            [phiHbyA_i, boundary_flux(mesh, U)], axis=0)
        for nonorth in range(cfg.n_non_orth + 1):
            pEqn = fvm.laplacian(mesh, rAf, p, corrected=cfg.corrected,
                                 gamma_dims=dimTime)
            pEqn = pEqn.replace_fields(
                source=pEqn.source + surface.surface_sum(mesh, phiHbyA))
            pEqn, ctl_p = linear.prep_pressure(
                pEqn, needs_reference(p, mesh), p_ctrl,
                cfg.p_ref_cell, cfg.p_ref_value)
            pdata, pperf = linear.solve(mesh, pEqn, p.data, ctl_p)
            p = p.with_data(pdata)
            if corr == 0 and nonorth == 0:
                diag["p_initial"] = pperf.initial_residual
                diag["p_iters"] = pperf.n_iterations
            diag["p_final"] = pperf.final_residual
            if nonorth == cfg.n_non_orth:
                phi = phiHbyA - pEqn.flux(mesh, p.data)
        U = U.with_data(HbyA - rA[:, None]
                        * fvc.grad_of(mesh, p, "Gauss linear"))
        U = U.correct_boundary_conditions(mesh, phi=phi)

    # ---- induction equation -------------------------------------------------
    for _ in range(cfg.n_b_correctors):
        wB = div_weights(mesh, phi, "linear", B)
        BEqn = (fvm.ddt(mesh, B, state["B0"], rdt)
                + fvm.div(mesh, phi, B, weights=wB)
                - fvm.laplacian(mesh, jnp.asarray(DB, mesh.v.dtype), B,
                                corrected=cfg.corrected,
                                gamma_dims=dimViscosity))
        # stretching term div(phiB, U) explicit (the reference carries
        # it implicitly in U — explicit is stable at MHD CFL and keeps
        # the B-solve a standard multi-RHS system)
        BEqn = BEqn.add_source(fvc.div(mesh, phiB, U), mesh)
        Bdata, bperf = linear.solve(mesh, BEqn, B.data, u_ctrl)
        B = B.with_data(Bdata)
        diag["Bx"] = bperf
        # div(B) cleaning projection
        hfB = surface.interpolate_internal(mesh, B.data)
        phiB_i = jnp.sum(mesh.sf[:nif] * hfB, axis=1) \
            * mesh.face_active[:nif]
        phiB = jnp.concatenate([phiB_i, boundary_flux(mesh, B)], axis=0)
        # B carries Alfven-velocity units (reference: createFields.H),
        # so the cleaning Poisson has exactly the pressure equation's
        # dimensional shape
        pBEqn = fvm.laplacian(mesh, jnp.ones(mesh.n_faces, mesh.v.dtype),
                              pB, corrected=cfg.corrected,
                              gamma_dims=dimTime)
        pBEqn = pBEqn.replace_fields(
            source=pBEqn.source + surface.surface_sum(mesh, phiB))
        pBEqn, ctl_pb = linear.prep_pressure(
            pBEqn, needs_reference(pB, mesh), pb_ctrl, 0, 0.0)
        pbdata, pbperf = linear.solve(mesh, pBEqn, pB.data, ctl_pb)
        pB = pB.with_data(pbdata)
        phiB = phiB - pBEqn.flux(mesh, pB.data)
        diag["pB"] = pbperf

    div_phi = surface.surface_sum(mesh, phi)
    diag["continuity"] = jnp.sum(jnp.abs(div_phi)) / jnp.sum(mesh.v)
    diag["divB"] = jnp.sum(jnp.abs(surface.surface_sum(mesh, phiB))) \
        / jnp.sum(mesh.v)
    sum_phi = jnp.sum(jnp.abs(phi)[mesh.cface] * jnp.abs(mesh.csign),
                      axis=1)
    diag["courant_max"] = 0.5 * jnp.max(sum_phi / mesh.v) * dt

    new_state = dict(state)
    new_state.update(U=U, p=p, B=B, pB=pB, phi=phi, phiB=phiB,
                     U0=U.data, B0=B.data)
    return new_state, diag


def initial_state(mesh, U: VolField, p: VolField, B: VolField,
                  pB: VolField) -> Dict:
    return {"U": U, "p": p, "B": B, "pB": pB,
            "phi": fvc.flux(mesh, U), "phiB": fvc.flux(mesh, B),
            "U0": U.data, "B0": B.data}


def make_step(mesh, cfg: MhdConfig):
    from .jitstep import jit_with_mesh

    return jit_with_mesh(
        lambda m, state, dt: mhd_step(m, state, dt, cfg), mesh,
        (cfg.p_controls, cfg.u_controls))
