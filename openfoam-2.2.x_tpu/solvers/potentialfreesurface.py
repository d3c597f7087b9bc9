"""potentialFreeSurfaceFoam — single-phase flow with a wave-pressure
free surface (no mesh motion).

Rebuild of reference: applications/solvers/multiphase/
potentialFreeSurfaceFoam/ + the waveSurfacePressure BC
(src/finiteVolume/fields/fvPatchFields/derived/waveSurfacePressure):
the free-surface patch stays geometrically fixed; a surface elevation
zeta lives on its faces, integrated from the patch flux

    d zeta / dt = phi / |Sf|,

and the (kinematic) pressure on the patch carries the linearised
hydrostatic head of the displaced surface

    p_patch = |g| * zeta.

Positive elevation raises patch pressure, which pushes flow away: the
restoring force of a small-amplitude gravity wave. Interior gravity is
absorbed into the pressure exactly (constant density), so the solver
is pisoFoam plus one dynamic BC — here the BC value is pytree data, so
the zeta update and the BC rewrite happen INSIDE the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.fields import VolField
from . import piso as piso_mod


class FreeSurfaceConfig(NamedTuple):
    flow: piso_mod.PisoConfig
    fs_patch: int                 # index of the freeSurface patch
    g_mag: float = 9.81


def pfs_step(mesh, state: Dict, dt: Any, cfg: FreeSurfaceConfig
             ) -> Tuple[Dict, Dict]:
    patch = mesh.patches[cfg.fs_patch]
    sl = patch.slice
    # 1. integrate the surface elevation from the patch flux
    zeta = state["zeta"] + dt * state["phi"][sl] / mesh.mag_sf[sl]
    # volume-neutral: remove any net elevation drift (closed basins;
    # the reference relies on the pressure reference for this)
    w = mesh.mag_sf[sl]
    zeta = zeta - jnp.sum(zeta * w) / jnp.sum(w)

    # 2. rewrite the freeSurface pressure BC: fixedValue |g| zeta
    p: VolField = state["p"]
    bcs = list(p.bcs)
    bc = bcs[cfg.fs_patch]
    bcs[cfg.fs_patch] = bc.replace(
        ref_value=cfg.g_mag * zeta,
        vfrac=jnp.ones(patch.size, mesh.v.dtype))
    p = dataclasses.replace(p, bcs=tuple(bcs))

    # 3. plain PISO step
    st = dict(state)
    st["p"] = p
    st, diag = piso_mod.piso_step(mesh, st, dt, cfg.flow)
    st["zeta"] = zeta
    diag["zeta_min"] = jnp.min(zeta)
    diag["zeta_max"] = jnp.max(zeta)
    return st, diag


def initial_state(mesh, U: VolField, p: VolField,
                  cfg: FreeSurfaceConfig, zeta0=None) -> Dict:
    n = mesh.patches[cfg.fs_patch].size
    zeta = (jnp.zeros(n, mesh.v.dtype) if zeta0 is None
            else jnp.asarray(zeta0, mesh.v.dtype))
    # the BC `kind` is static dispatch: make the freeSurface patch a
    # mixed (value) BC host-side so the per-step in-jit ref_value
    # rewrite actually reaches the pressure matrix
    bcs = list(p.bcs)
    bcs[cfg.fs_patch] = bcs[cfg.fs_patch].replace(
        kind="mixed", ref_value=cfg.g_mag * zeta,
        ref_grad=jnp.zeros(n, mesh.v.dtype),
        vfrac=jnp.ones(n, mesh.v.dtype))
    p = dataclasses.replace(p, bcs=tuple(bcs))
    st = piso_mod.initial_state(mesh, U, p)
    st["zeta"] = zeta
    return st


def make_step(mesh, cfg: FreeSurfaceConfig):
    return jax.jit(lambda state, dt: pfs_step(mesh, state, dt, cfg))
