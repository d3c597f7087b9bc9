"""Compressible buoyant solvers (reference:
applications/solvers/heatTransfer/{buoyantSimpleFoam,
buoyantPimpleFoam}/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models.thermo import PerfectGas
from foamtpu.solvers import buoyantrho

BOX = """
convertToMeters 0.1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (16 16 1) simpleGrading (1 1 1) );
boundary
(
    hotWall  { type wall; faces ((0 4 7 3)); }
    coldWall { type wall; faces ((2 6 5 1)); }
    adiabatic { type wall; faces ((1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""

P_DIM = DimensionSet.of(1, -1, -2)
T_DIM = DimensionSet.of(0, 0, 0, 1)
# Ra ~ 6e4 laminar convection (mu 10x air at this scale)
TH = PerfectGas(R=287.0, Cv=717.5, mu=1.8e-4)


def _fields(T_hot=330.0, T_cold=270.0):
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    ub, pb, tb = [], [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            for lst in (ub, pb, tb):
                lst.append(pf.PatchField(kind="empty", vfrac=0.0))
            continue
        ub.append(pf.fixed_value(jnp.zeros(3)))
        pb.append(pf.zero_gradient())
        if patch.name == "hotWall":
            tb.append(pf.fixed_value(T_hot))
        elif patch.name == "coldWall":
            tb.append(pf.fixed_value(T_cold))
        else:
            tb.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(ub))
    p_rgh = vol_scalar(mesh, 1e5, name="p_rgh", dims=P_DIM, bcs=tuple(pb))
    T = vol_scalar(mesh, 300.0, name="T", dims=T_DIM, bcs=tuple(tb))
    return mesh, U, p_rgh, T


def test_buoyantsimple_differentially_heated_cavity():
    """Steady compressible natural convection in a closed box: hot left
    wall, cold right wall. The converged flow must circulate (rising at
    the hot wall, sinking at the cold wall), T bounded by the walls,
    residuals dropping."""
    mesh, U, p_rgh, T = _fields()
    cfg = buoyantrho.BuoyantRhoConfig(
        thermo=TH, steady=True, alpha_u=0.3, alpha_p=0.7, alpha_e=0.3,
        g=(0.0, -9.81, 0.0))
    state = buoyantrho.initial_state(mesh, U, p_rgh, T, TH,
                                     steady=True)
    step = jax.jit(
        lambda s, d: buoyantrho.buoyantrho_step(mesh, s, d, cfg))
    one = jnp.asarray(1.0, mesh.v.dtype)
    first = None
    for i in range(150):
        state, diag = step(state, one)
        if i == 0:
            first = float(np.max(np.asarray(diag["Ux"].initial_residual)))
    last = float(np.max(np.asarray(diag["Ux"].initial_residual)))
    assert np.isfinite(last) and last < 0.5 * first
    Ud = np.asarray(state["U"].data)
    Td = np.asarray(state["T"].data)
    c = np.asarray(mesh.c)
    assert 269.9 < Td.min() and Td.max() < 330.1
    # hot wall at x=0: conduction + convection => left side warmer
    left = c[:, 0] < 0.025
    right = c[:, 0] > 0.075
    assert Td[left].mean() > Td[right].mean() + 10.0
    # circulation: rising along the hot wall, sinking at the cold wall
    uy_left = Ud[left, 1].mean()
    uy_right = Ud[right, 1].mean()
    assert uy_left > 0.005 and uy_right < -0.005, (uy_left, uy_right)
    # plausible convection magnitude (not runaway)
    assert np.abs(Ud).max() < 2.0


def test_buoyantpimple_transient_conserves_mass():
    """Transient closed box: total mass must stay constant (the psi
    compressibility term balancing div(phi)) and the flow must start
    convecting."""
    mesh, U, p_rgh, T = _fields()
    cfg = buoyantrho.BuoyantRhoConfig(
        thermo=TH, steady=False, n_outer=2, n_correctors=2,
        g=(0.0, -9.81, 0.0))
    state = buoyantrho.initial_state(mesh, U, p_rgh, T, TH,
                                     steady=False)
    gh = np.asarray(mesh.c) @ np.array([0.0, -9.81, 0.0])
    v = np.asarray(mesh.v)
    rho0 = np.asarray(state["rho0"])
    m0 = float((rho0 * v).sum())
    step = jax.jit(
        lambda s, d: buoyantrho.buoyantrho_step(mesh, s, d, cfg))
    dt = jnp.asarray(2e-3, mesh.v.dtype)
    for _ in range(25):
        state, diag = step(state, dt)
    rho1 = np.asarray(state["rho0"])
    assert np.isfinite(rho1).all()
    m1 = float((rho1 * v).sum())
    assert abs(m1 - m0) / m0 < 2e-3, (m0, m1)
    Td = np.asarray(state["T"].data)
    assert 269.0 < Td.min() and Td.max() < 331.0
    assert float(np.abs(np.asarray(state["U"].data)).max()) > 1e-3
