"""Radiation — P1 spherical-harmonics model.

Rebuild of reference: src/thermophysicalModels/radiationModels/
(radiationModel::P1 + constantAbsorptionEmission +
MarshakRadiationFvPatchScalarField). The P1 equation for incident
radiation G [W/m^2]:

    div(Gamma grad G) - a G = -4 e sigma T^4,   Gamma = 1/(3(a+s))

with the Marshak boundary condition (mixed): at a grey wall of
emissivity eps and temperature Tw,

    refValue      = 4 sigma Tw^4
    valueFraction = eps / (2 (2 - eps)) /
                    (eps / (2 (2 - eps)) + Gamma * deltaCoeffs)

The energy-equation coupling (radiationModel::Sh):
    Sh = a G - 4 e sigma T^4     [W/m^3]
"""

from __future__ import annotations

import dataclasses as _dc
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..bc import patchfields as pf
from ..core.dimensions import DimensionSet
from ..core.fields import VolField, vol_scalar
from ..ops import fvm
from ..solvers import linear

SIGMA = 5.670374419e-8   # Stefan-Boltzmann [W/m^2/K^4]


class P1Config(NamedTuple):
    a: float = 0.5            # absorption coefficient [1/m]
    s: float = 0.0            # scattering coefficient [1/m]
    e: float = 0.5            # emission coefficient (= a for grey gas)
    emissivity: float = 1.0   # wall emissivity (Marshak BC)
    g_controls: Dict = None

    @property
    def gamma(self) -> float:
        return 1.0 / (3.0 * (self.a + self.s) + 1e-30)


def make_G(mesh, cfg: P1Config, T_wall_bcs) -> VolField:
    """Initial G field with Marshak mixed BCs on wall patches (other
    patches zero-gradient). T_wall_bcs: the T field's BCs, used to read
    wall temperatures."""
    bcs = []
    eps = cfg.emissivity
    marshak_f0 = eps / (2.0 * (2.0 - eps))
    for patch, tb in zip(mesh.patches, T_wall_bcs):
        if patch.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif pf.is_value_bc(tb):
            tw = jnp.asarray(tb.ref_value)
            gw = 4.0 * SIGMA * tw ** 4
            dc = mesh.delta_coeffs[patch.slice]
            frac = marshak_f0 / (marshak_f0 + cfg.gamma * dc)
            bcs.append(pf.mixed(jnp.broadcast_to(gw, (patch.size,)),
                                0.0, frac))
        else:
            bcs.append(pf.zero_gradient())
    G = vol_scalar(mesh, 0.0, name="G",
                   dims=DimensionSet.of(1, 0, -3), bcs=tuple(bcs))
    return G


def solve_G(mesh, G: VolField, T: Any, cfg: P1Config
            ) -> Tuple[VolField, Any]:
    """One implicit P1 solve (reference: P1::calculate)."""
    ctl = cfg.g_controls or {"solver": "PCG",
                             "preconditioner": "polynomial",
                             "tolerance": 1e-8, "relTol": 0.01,
                             "maxIter": 2000}
    lap = fvm.laplacian(mesh, jnp.asarray(cfg.gamma, mesh.v.dtype), G,
                        corrected=False,
                        gamma_dims=DimensionSet.of(0, 1, 0))
    # -lap is positive-definite; add the absorption sink a*G and the
    # emission source 4 e sigma T^4
    eqn = (-lap).replace_fields(
        diag=(-lap).diag + mesh.v * cfg.a,
        source=(-lap).source
        + mesh.v * 4.0 * cfg.e * SIGMA * jnp.asarray(T) ** 4)
    data, perf = linear.solve(mesh, eqn, G.data, ctl)
    return G.with_data(jnp.maximum(data, 0.0)), perf


def Sh(mesh, G: VolField, T: Any, cfg: P1Config) -> Any:
    """Radiative source for the energy equation [W/m^3]
    (reference: radiationModel::Sh = a*G - 4*e*sigma*T^4)."""
    return cfg.a * G.data - 4.0 * cfg.e * SIGMA * jnp.asarray(T) ** 4
