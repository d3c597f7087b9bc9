"""Transport (viscosity) models.

Reference: src/transportModels/incompressible/viscosityModels/ —
Newtonian, powerLaw, CrossPowerLaw, BirdCarreau, HerschelBulkley.
Each model is a pure function nu(strain-rate) -> [nC]; selection by
the transportModel keyword (reference: singlePhaseTransportModel).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from ..core.dictionary import FoamDict, dimensioned_scalar
from ..ops import fvc


def strain_rate(mesh, U) -> Any:
    """sqrt(2) |symm(grad U)| (reference: strainRate())."""
    g = fvc.grad(mesh, U)
    s = 0.5 * (g + jnp.swapaxes(g, 1, 2))
    return jnp.sqrt(2.0 * jnp.sum(s * s, axis=(1, 2)))


def newtonian(props: FoamDict) -> Callable:
    _, nu0 = dimensioned_scalar(props["nu"])

    def nu(mesh, U):
        return jnp.full((mesh.n_cells,), nu0, mesh.v.dtype)

    return nu


def power_law(props: FoamDict) -> Callable:
    c = props.subdict("powerLawCoeffs")
    _, k = dimensioned_scalar(c["k"])
    _, n = dimensioned_scalar(c["n"])
    _, nu_min = dimensioned_scalar(c["nuMin"])
    _, nu_max = dimensioned_scalar(c["nuMax"])

    def nu(mesh, U):
        sr = strain_rate(mesh, U)
        return jnp.clip(k * jnp.maximum(sr, 1e-10) ** (n - 1.0), nu_min, nu_max)

    return nu


def cross_power_law(props: FoamDict) -> Callable:
    c = props.subdict("CrossPowerLawCoeffs")
    _, nu0 = dimensioned_scalar(c["nu0"])
    _, nu_inf = dimensioned_scalar(c["nuInf"])
    _, m = dimensioned_scalar(c["m"])
    _, n = dimensioned_scalar(c["n"])

    def nu(mesh, U):
        sr = strain_rate(mesh, U)
        return nu_inf + (nu0 - nu_inf) / (1.0 + (m * sr) ** n)

    return nu


def bird_carreau(props: FoamDict) -> Callable:
    c = props.subdict("BirdCarreauCoeffs")
    _, nu0 = dimensioned_scalar(c["nu0"])
    _, nu_inf = dimensioned_scalar(c["nuInf"])
    _, k = dimensioned_scalar(c["k"])
    _, n = dimensioned_scalar(c["n"])

    def nu(mesh, U):
        sr = strain_rate(mesh, U)
        return nu_inf + (nu0 - nu_inf) * (1.0 + (k * sr) ** 2) ** ((n - 1.0) / 2.0)

    return nu


def herschel_bulkley(props: FoamDict) -> Callable:
    c = props.subdict("HerschelBulkleyCoeffs")
    _, nu0 = dimensioned_scalar(c["nu0"])
    _, tau0 = dimensioned_scalar(c["tau0"])
    _, k = dimensioned_scalar(c["k"])
    _, n = dimensioned_scalar(c["n"])

    def nu(mesh, U):
        sr = jnp.maximum(strain_rate(mesh, U), 1e-10)
        return jnp.minimum(nu0, tau0 / sr + k * sr ** (n - 1.0))

    return nu


_MODELS: Dict[str, Callable] = {
    "Newtonian": newtonian,
    "powerLaw": power_law,
    "CrossPowerLaw": cross_power_law,
    "BirdCarreau": bird_carreau,
    "HerschelBulkley": herschel_bulkley,
}


def select(props: FoamDict) -> Callable:
    """singlePhaseTransportModel::New equivalent."""
    name = str(props.get("transportModel", "Newtonian"))
    return _MODELS[name](props)
