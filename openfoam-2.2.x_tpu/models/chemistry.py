"""Finite-rate chemistry — Arrhenius reaction sets integrated per cell.

Rebuild of reference: src/thermophysicalModels/chemistryModel/
(chemistryModel::omega, solve — the stiff per-cell ODE integration of
reaction sources) and src/combustionModels/infinitelyFastChemistry.
TPU redesign: the reference loops cells and calls a sequential ODE
solver per cell; here the WHOLE field of cell states integrates as one
`jax.vmap` of the Rosenbrock solver (foamtpu.ode) — one fused device
program, no per-cell host dispatch.

Species state is molar concentration c [kmol/m^3]; reactions are
irreversible Arrhenius k = A T^beta exp(-Ta/T) with integer (or real)
stoichiometry. Heat release couples back through the species formation
enthalpies.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ode


class Reaction(NamedTuple):
    """lhs/rhs: stoichiometric coefficient per species (dense [nS])."""
    lhs: Any           # [nS] reactant orders/coefficients
    rhs: Any           # [nS] product coefficients
    A: float           # pre-exponential
    beta: float        # temperature exponent
    Ta: float          # activation temperature [K]


@dataclasses.dataclass(frozen=True)
class ChemistryModel:
    """An immutable reaction mechanism over nS species."""

    species: Tuple[str, ...]
    lhs: Any           # [nR, nS]
    rhs: Any           # [nR, nS]
    A: Any             # [nR]
    beta: Any          # [nR]
    Ta: Any            # [nR]
    hf: Any            # [nS] formation enthalpy [J/kmol] (heat release)

    @staticmethod
    def build(species: Sequence[str], reactions: Sequence[Dict],
              hf: Optional[Sequence[float]] = None) -> "ChemistryModel":
        ns = len(species)
        idx = {s: i for i, s in enumerate(species)}
        L = np.zeros((len(reactions), ns))
        R = np.zeros((len(reactions), ns))
        A, beta, Ta = [], [], []
        for r, spec in enumerate(reactions):
            for name, coef in spec["lhs"]:
                L[r, idx[name]] += coef
            for name, coef in spec["rhs"]:
                R[r, idx[name]] += coef
            A.append(float(spec["A"]))
            beta.append(float(spec.get("beta", 0.0)))
            Ta.append(float(spec.get("Ta", 0.0)))
        return ChemistryModel(
            species=tuple(species),
            lhs=jnp.asarray(L), rhs=jnp.asarray(R),
            A=jnp.asarray(np.asarray(A)),
            beta=jnp.asarray(np.asarray(beta)),
            Ta=jnp.asarray(np.asarray(Ta)),
            hf=jnp.asarray(np.zeros(ns) if hf is None
                           else np.asarray(hf, dtype=float)))

    # -- reaction rates ------------------------------------------------------
    def k(self, T):
        """Arrhenius rate constants [nR]."""
        T = jnp.maximum(T, 1e-3)
        return self.A * T ** self.beta * jnp.exp(-self.Ta / T)

    def omega(self, c, T):
        """dc/dt [nS] for one cell state (c [nS], T scalar)
        (reference: chemistryModel::omega)."""
        kf = self.k(T)
        cs = jnp.maximum(c, 0.0)
        # rate_r = k_r * prod_s c_s^lhs_rs; the floor must stay inside
        # f32 range (log(1e-300) is -inf in f32 and 0*inf = NaN)
        logc = jnp.log(jnp.maximum(cs, 1e-20))
        rate = kf * jnp.exp(self.lhs @ logc)
        return (self.rhs - self.lhs).T @ rate

    def heat_release(self, c, T):
        """-sum_s hf_s * dc_s/dt [J/m^3/s] for one cell."""
        return -jnp.dot(self.hf, self.omega(c, T))

    # -- stiff integration (the chemistry `solve`) ---------------------------
    def solve(self, c_field, T_field, dt, rtol=1e-6, atol=1e-12):
        """Integrate every cell's concentrations over dt with the
        Rosenbrock solver, vmapped (reference: chemistryModel::solve
        looping cells with the selected ODESolver). T frozen over the
        sub-step (segregated coupling, as the reference)."""

        def one(c, T):
            f = lambda t, y: self.omega(y, T)
            return ode.integrate(f, c, 0.0, dt, solver="rodas23",
                                 rtol=rtol, atol=atol).y

        return jax.vmap(one)(c_field, T_field)
