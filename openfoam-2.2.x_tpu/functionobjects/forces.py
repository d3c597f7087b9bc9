"""forces / forceCoeffs: pressure + viscous force integration over
patches (reference: src/postProcessing/functionObjects/forces/)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops import fvc
from .base import FunctionObject, register


def patch_forces(mesh, U_field, p_data, nu_eff, patch_names, rho_ref=1.0):
    """(F_pressure, F_viscous) [3] integrated over the named patches.
    Incompressible convention: p is kinematic -> multiply by rhoRef."""
    Fp = jnp.zeros(3)
    Fv = jnp.zeros(3)
    own = mesh.owner
    for p in mesh.patches:
        if p.name not in patch_names:
            continue
        sl = p.slice
        cells = own[sl]
        sf = mesh.sf[sl]
        # pressure force: p * Sf (outward)
        Fp = Fp + jnp.sum(p_data[cells][:, None] * sf, axis=0)
        # viscous force: -mu * dU/dn * |Sf| (wall shear)
        dc = mesh.delta_coeffs[sl]
        ub = None
        for pp, bc in zip(mesh.patches, U_field.bcs):
            if pp.name == p.name:
                from ..bc import patchfields as pfm

                ub = pfm.evaluate(bc, mesh, pp, U_field.data)
        dudn = (ub - U_field.data[cells]) * dc[:, None]
        nue = nu_eff[cells] if hasattr(nu_eff, "shape") and nu_eff.ndim else nu_eff
        Fv = Fv - jnp.sum(
            (nue[:, None] if hasattr(nue, "ndim") and nue.ndim else nue)
            * dudn * mesh.mag_sf[sl][:, None], axis=0)
    return Fp * rho_ref, Fv * rho_ref


class Forces(FunctionObject):
    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        pats = spec.get("patches", [])
        self.patches = {str(p) for p in (pats if isinstance(pats, list) else [pats])}
        self.rho_ref = float(spec.get("rhoInf", spec.get("rhoRef", 1.0)))
        self.path = os.path.join(self.out_dir, "forces.dat")
        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write("# Time Fp(x y z) Fv(x y z)\n")

    def execute(self, time_name, state):
        case = self.case
        mesh = case.mesh
        U = state["U"]
        p = state.get("p", state.get("p_rgh"))
        p_data = p.data if hasattr(p, "data") else p
        nu_eff = None
        if "turb" in state and state["turb"] and "nut" in state["turb"]:
            nu_eff = state["turb"]["nut"].data
        if nu_eff is None:
            nu_eff = jnp.zeros(mesh.n_cells, mesh.v.dtype)
        from ..core.dictionary import dimensioned_scalar

        try:
            _, nu0 = dimensioned_scalar(case.transport_properties()["nu"])
        except Exception:
            nu0 = 0.0
        Fp, Fv = patch_forces(mesh, U, p_data, nu_eff + nu0,
                              self.patches, self.rho_ref)
        Fp, Fv = np.asarray(Fp), np.asarray(Fv)
        with open(self.path, "a") as f:
            f.write(f"{time_name} ({Fp[0]:.8g} {Fp[1]:.8g} {Fp[2]:.8g}) "
                    f"({Fv[0]:.8g} {Fv[1]:.8g} {Fv[2]:.8g})\n")


register("forces", Forces)
register("forceCoeffs", Forces)
