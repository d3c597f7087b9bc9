"""MULES: explicit flux-corrected transport limiter for bounded
advection (the VOF alpha equation).

Reference: src/finiteVolume/fvMatrices/solvers/MULES/MULES.C —
MULES::limiter (Zalesak FCT with a fixed number of limiter iterations)
and MULES::explicitSolve. Gather-form implementation: all per-cell sums
ride the mesh cface tables; per-face limiter is the min over the two
adjacent cells' allowables, computed by gathering cell ratios back to
faces through owner/neighbour.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from . import surface


def _cell_extrema(mesh, *fields):
    """Per-cell min/max over the cell and its face neighbours of the
    given cell fields."""
    lo = None
    hi = None
    for f in fields:
        nbr_vals = f[mesh.cnbr]  # [nC,K]
        valid = mesh.cnbr_valid > 0
        nb_max = jnp.max(jnp.where(valid, nbr_vals, -jnp.inf), axis=1)
        nb_min = jnp.min(jnp.where(valid, nbr_vals, jnp.inf), axis=1)
        fmax = jnp.maximum(f, jnp.where(jnp.isfinite(nb_max), nb_max, f))
        fmin = jnp.minimum(f, jnp.where(jnp.isfinite(nb_min), nb_min, f))
        hi = fmax if hi is None else jnp.maximum(hi, fmax)
        lo = fmin if lo is None else jnp.minimum(lo, fmin)
    return lo, hi


def limiter(mesh, psi: Any, phi_bd: Any, phi_corr: Any, dt: Any,
            psi_max: float = 1.0, psi_min: float = 0.0,
            n_iter: int = 3) -> Any:
    """Zalesak limiter lambda [nF] in [0,1] for the correction flux.

    psi: cell field [nC] (alpha at time n)
    phi_bd: bounded (upwind) face flux of psi [nF]
    phi_corr: antidiffusive correction flux [nF]
    """
    nif = mesh.n_internal_faces
    v_dt = mesh.v / dt

    # low-order update
    div_bd = surface.surface_sum(mesh, phi_bd)
    psi_bd = psi - div_bd / v_dt

    lo, hi = _cell_extrema(mesh, psi, psi_bd)
    hi = jnp.minimum(hi, psi_max)
    lo = jnp.maximum(lo, psi_min)

    lam = jnp.ones_like(phi_corr)
    for _ in range(n_iter):
        corr = phi_corr * lam
        # signed per-cell: outgoing positive-corr sum P+ / incoming P-
        g = corr[mesh.cface] * mesh.csign  # [nC,K] outward corrections
        p_out = jnp.sum(jnp.maximum(g, 0.0), axis=1)   # removes psi
        p_in = jnp.sum(jnp.maximum(-g, 0.0), axis=1)   # adds psi
        q_up = (hi - psi_bd) * v_dt
        q_dn = (psi_bd - lo) * v_dt
        r_in = jnp.clip(q_up / jnp.maximum(p_in, 1e-30), 0.0, 1.0)
        r_out = jnp.clip(q_dn / jnp.maximum(p_out, 1e-30), 0.0, 1.0)
        # face limiter: for correction flux from owner to neighbour,
        # owner loses (r_out[own]) and neighbour gains (r_in[nei]);
        # reversed for negative corrections
        own = mesh.owner[:nif]
        nei = mesh.neighbour
        c_i = corr[:nif]
        lam_i = jnp.where(
            c_i >= 0,
            jnp.minimum(r_out[own], r_in[nei]),
            jnp.minimum(r_in[own], r_out[nei]),
        )
        # boundary: limit by the owner cell only (compact owner
        # extrapolation — empty faces carry zero corr anyway)
        c_b = corr[nif:]
        lam_b = jnp.where(c_b >= 0, surface.owner_to_b(mesh, r_out),
                          surface.owner_to_b(mesh, r_in))
        lam = lam * jnp.concatenate([lam_i, lam_b], axis=0)
    return lam


def explicit_solve(mesh, psi: Any, phi_bd: Any, phi_corr: Any, dt: Any,
                   psi_max: float = 1.0, psi_min: float = 0.0,
                   n_iter: int = 3) -> Tuple[Any, Any]:
    """MULES::explicitSolve: bounded update of psi and the consistent
    limited face flux. Returns (psi_new, phi_psi)."""
    lam = limiter(mesh, psi, phi_bd, phi_corr, dt,
                  psi_max=psi_max, psi_min=psi_min, n_iter=n_iter)
    phi_psi = phi_bd + lam * phi_corr
    div_total = surface.surface_sum(mesh, phi_psi)
    psi_new = psi - div_total * dt / mesh.v
    return psi_new, phi_psi
