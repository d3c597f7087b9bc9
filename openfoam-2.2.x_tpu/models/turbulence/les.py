"""LES subgrid-scale models.

Reference: src/turbulenceModels/incompressible/LES/ — Smagorinsky,
oneEqEddy (k-equation SGS), plus LESdeltas (cubeRootVol). Standard
published closures; delta = V^(1/3) (cubeRootVolDelta)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ...core.dimensions import dimViscosity
from ...core.fields import VolField
from ...ops import fvc, fvm
from .base import TurbulenceModel, bound_below, production, register

K_MIN = 1e-10


class Smagorinsky(TurbulenceModel):
    """Smagorinsky SGS (reference: LES/Smagorinsky/Smagorinsky.C):
    nuSgs = (Ck*delta)^2 * sqrt(2|symm(grad U)|^2) with the reference's
    Ck/Ce parameterisation: Cs^2 = Ck*sqrt(Ck/Ce)."""

    name = "Smagorinsky"
    field_names = ("nut",)
    Ck = 0.094
    Ce = 1.048

    def __init__(self, nu, coeffs=None):
        super().__init__(nu, coeffs)
        c = self.coeffs or {}
        self.Ck = float(c.get("ck", c.get("Ck", self.Ck)))
        self.Ce = float(c.get("ce", c.get("Ce", self.Ce)))

    def nut(self, mesh, tstate):
        return tstate["nut"].data

    def nu_eff_face(self, mesh, tstate):
        return self.nu + fvc.interpolate(mesh, tstate["nut"])

    def correct(self, mesh, tstate, U, phi, dt, steady=False, relax=1.0,
                controls=None, phi_slot=None):
        nut_f: VolField = tstate["nut"]
        delta = jnp.cbrt(mesh.v)
        _, S2 = production(mesh, jnp.zeros_like(mesh.v), U)
        magS = jnp.sqrt(jnp.maximum(S2, 0.0))
        # k_sgs = (Ck/Ce)*delta^2*S2; nuSgs = Ck*delta*sqrt(k)
        k_sgs = (self.Ck / self.Ce) * delta ** 2 * S2
        nut_new = self.Ck * delta * jnp.sqrt(jnp.maximum(k_sgs, 0.0))
        new_nut = nut_f.with_data(nut_new).correct_boundary_conditions(
            mesh, nu=self.nu, U=U.data)
        new = dict(tstate)
        new["nut"] = new_nut
        return new, {}


class OneEqEddy(Smagorinsky):
    """One-equation eddy viscosity SGS model (reference:
    LES/oneEqEddy/oneEqEddy.C): transport equation for k_sgs,
    nuSgs = Ck*delta*sqrt(k)."""

    name = "oneEqEddy"
    field_names = ("k", "nut")

    def correct(self, mesh, tstate, U, phi, dt, steady=False, relax=1.0,
                controls=None, phi_slot=None):
        k_f: VolField = tstate["k"]
        nut_f: VolField = tstate["nut"]
        k, nut = k_f.data, nut_f.data
        delta = jnp.cbrt(mesh.v)
        rdt = 1.0 / dt

        from .ras import _gamma_forms, _phi_slotform

        G, S2 = production(mesh, nut, U)
        eps_coeff = self.Ce * jnp.sqrt(jnp.maximum(k, K_MIN)) / delta
        phi_sl = _phi_slotform(mesh, phi, phi_slot)
        k_flat, k_slot = _gamma_forms(mesh, self.nu, nut_f)
        k_eqn = (
            fvm.ddt(mesh, k_f, k, rdt)
            + fvm.div(mesh, phi, k_f, phi_slot=phi_sl)
            - fvm.laplacian(mesh, k_flat, k_f, corrected=False,
                            gamma_dims=dimViscosity, gamma_slot=k_slot)
            + fvm.Sp(mesh, eps_coeff, k_f)
        )
        k_eqn = k_eqn.add_source(G, mesh)
        from .ras import _solve_transport

        k_new, perf = _solve_transport(mesh, k_f, k_eqn, controls)
        k_new = bound_below(k_new, K_MIN)
        nut_new = self.Ck * delta * jnp.sqrt(k_new)
        new_nut = nut_f.with_data(nut_new).correct_boundary_conditions(
            mesh, k=k_new, nu=self.nu, U=U.data)
        new = dict(tstate)
        new.update(k=k_f.with_data(k_new), nut=new_nut)
        return new, {"k": perf}


register("Smagorinsky", Smagorinsky)
register("oneEqEddy", OneEqEddy)
