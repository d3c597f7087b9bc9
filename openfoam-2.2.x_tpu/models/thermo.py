"""Thermophysical models (compressible stack).

Reference: src/thermophysicalModels/{specie,basic}/ — the
EOS/thermo/transport template layering (perfectGas + hConst/eConst +
const/sutherland transport composed into psiThermo/rhoThermo). TPU
rebuild: a small dataclass of constants + pure functions; the template
tower collapses to plain composition.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..core.dictionary import FoamDict


@dataclasses.dataclass(frozen=True)
class PerfectGas:
    """perfectGas EOS + eConst/hConst thermo + const/Sutherland
    transport (reference: specie/equationOfState/perfectGas,
    thermo/eConst, transport/{const,sutherland}Transport)."""

    R: float = 287.0          # specific gas constant [J/kg K]
    Cv: float = 717.5         # [J/kg K]
    mu: float = 0.0           # dynamic viscosity (0 = inviscid)
    Pr: float = 0.7
    sutherland_As: float = 0.0   # if >0 use Sutherland mu(T)
    sutherland_Ts: float = 110.4

    @property
    def Cp(self) -> float:
        return self.Cv + self.R

    @property
    def gamma(self) -> float:
        return self.Cp / self.Cv

    # -- state relations -------------------------------------------------------
    def p(self, rho: Any, T: Any) -> Any:
        return rho * self.R * T

    def rho(self, p: Any, T: Any) -> Any:
        return p / (self.R * T)

    def T_from_e(self, e: Any) -> Any:
        return e / self.Cv

    def e(self, T: Any) -> Any:
        return self.Cv * T

    def c(self, T: Any) -> Any:
        """speed of sound."""
        return jnp.sqrt(self.gamma * self.R * jnp.maximum(T, 1e-10))

    def psi(self, T: Any) -> Any:
        """compressibility psi = rho/p = 1/(R T)."""
        return 1.0 / (self.R * jnp.maximum(T, 1e-10))

    def mu_T(self, T: Any) -> Any:
        if self.sutherland_As > 0:
            return self.sutherland_As * jnp.sqrt(T) / (1.0 + self.sutherland_Ts / T)
        return jnp.asarray(self.mu)

    def kappa(self, T: Any) -> Any:
        """thermal conductivity from Pr."""
        return self.mu_T(T) * self.Cp / self.Pr


def from_dict(d: FoamDict) -> PerfectGas:
    """Build from a thermophysicalProperties dictionary (accepts both
    the 2.2 `thermoType` one-liner cases and explicit mixture dicts)."""
    mix = d.get("mixture")
    R, Cv, mu, Pr = 287.0, 717.5, 0.0, 0.7
    As, Ts = 0.0, 110.4
    if isinstance(mix, FoamDict):
        spec = mix.get("specie", FoamDict())
        if isinstance(spec, FoamDict):
            nmol = float(spec.get("nMoles", 1))
            W = float(spec.get("molWeight", 28.96))
            R = 8314.47 / W * nmol
        th = mix.get("thermodynamics", FoamDict())
        if isinstance(th, FoamDict):
            if "Cv" in th:
                Cv = float(th["Cv"])
            elif "Cp" in th:
                Cv = float(th["Cp"]) - R
        tr = mix.get("transport", FoamDict())
        if isinstance(tr, FoamDict):
            mu = float(tr.get("mu", 0.0))
            Pr = float(tr.get("Pr", 0.7))
            As = float(tr.get("As", 0.0))
            Ts = float(tr.get("Ts", 110.4))
    elif isinstance(mix, list):
        # 2.2 one-line mixture: name nMoles molWeight Cv/Cp mu Pr ...
        nums = [float(x) for x in mix if isinstance(x, (int, float))]
        if len(nums) >= 5:
            nmol, W, CpCv, Hf_or_mu = nums[0], nums[1], nums[2], nums[3]
            R = 8314.47 / W * nmol
            Cv = CpCv - R if CpCv > R else CpCv
            if len(nums) >= 6:
                mu, Pr = nums[4], nums[5]
    return PerfectGas(R=R, Cv=Cv, mu=mu, Pr=Pr,
                      sutherland_As=As, sutherland_Ts=Ts)
