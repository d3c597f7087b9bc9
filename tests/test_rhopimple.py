"""Pressure-based compressible solvers (reference:
applications/solvers/compressible/{rhoPimpleFoam,rhoSimpleFoam,
sonicFoam}/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models.thermo import PerfectGas
from foamtpu.solvers import rhopimple

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.1) (1 0 0.1) (1 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (20 20 1) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""

CHANNEL = """
convertToMeters 1;
vertices
(
    (0 0 0) (2 0 0) (2 0.5 0) (0 0.5 0)
    (0 0 0.1) (2 0 0.1) (2 0.5 0.1) (0 0.5 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (24 8 1) simpleGrading (1 1 1) );
boundary
(
    inlet { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls { type wall; faces ((1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""

TH = PerfectGas(R=287.0, Cv=717.5, mu=1.8e-5)
P_DIM = DimensionSet.of(1, -1, -2)
T_DIM = DimensionSet.of(0, 0, 0, 1)


def _box_fields():
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    bcs_w, bcs_zg = [], []
    for p in mesh.patches:
        if p.type == "empty":
            bcs_w.append(pf.PatchField(kind="empty", vfrac=0.0))
            bcs_zg.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs_w.append(pf.fixed_value(jnp.zeros(3)))
            bcs_zg.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(bcs_w))
    # gaussian pressure bump -> acoustic ring-down in a closed box
    c = np.asarray(mesh.c)
    r2 = ((c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.5) ** 2) / 0.05 ** 2
    p0 = 1e5 * (1.0 + 0.01 * np.exp(-r2))
    p = vol_scalar(mesh, 0.0, name="p", dims=P_DIM,
                   bcs=tuple(bcs_zg)).with_data(
        jnp.asarray(p0, mesh.v.dtype))
    T = vol_scalar(mesh, 300.0, name="T", dims=T_DIM, bcs=tuple(bcs_zg))
    return mesh, U, p, T


def test_rhopimple_acoustic_box_conserves_mass():
    """Closed box with a pressure bump: the acoustic transient must
    conserve total mass to roundoff and keep p/T bounded (the psi*dp/dt
    compressibility term balancing div(phi))."""
    mesh, U, p, T = _box_fields()
    cfg = rhopimple.RhoPimpleConfig(thermo=TH, n_outer=2, n_correctors=2,
                                    div_scheme="linear")
    state = rhopimple.initial_state(mesh, U, p, T, TH)
    v = np.asarray(mesh.v)
    m0 = float((np.asarray(TH.rho(p.data, T.data)) * v).sum())
    step = jax.jit(lambda s, d: rhopimple.rhopimple_step(mesh, s, d, cfg))
    # dt ~ 0.2 * dx/c, c ~ 347 m/s
    dt = jnp.asarray(0.2 * 0.05 / 350.0, mesh.v.dtype)
    for _ in range(20):
        state, diag = step(state, dt)
    pd = np.asarray(state["p"].data)
    Td = np.asarray(state["T"].data)
    assert np.isfinite(pd).all() and np.isfinite(Td).all()
    assert 0.98e5 < pd.min() and pd.max() < 1.03e5
    assert 295.0 < Td.min() and Td.max() < 305.0
    m1 = float((np.asarray(TH.rho(state["p"].data, state["T"].data))
                * v).sum())
    assert abs(m1 - m0) / m0 < 1e-4
    # the bump actually launched a wave
    assert float(np.abs(np.asarray(state["U"].data)).max()) > 0.05


def test_rhosimple_channel_converges():
    """Steady subsonic heated channel (Re ~ 50 so the profile develops
    within the domain): rhoSimpleFoam converges with mass flux in == out
    and T between inlet and wall bounds."""
    TH_V = PerfectGas(R=287.0, Cv=717.5, mu=0.116)  # Re = rho U H/mu ~ 50
    mesh = to_device(blockmesh.generate(parse_string(CHANNEL)))
    ub, pb, tb = [], [], []
    for pt in mesh.patches:
        if pt.type == "empty":
            for lst in (ub, pb, tb):
                lst.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif pt.name == "inlet":
            ub.append(pf.fixed_value(jnp.asarray([10.0, 0.0, 0.0])))
            pb.append(pf.zero_gradient())
            tb.append(pf.fixed_value(300.0))
        elif pt.name == "outlet":
            ub.append(pf.zero_gradient())
            pb.append(pf.fixed_value(1e5))
            tb.append(pf.zero_gradient())
        else:
            ub.append(pf.fixed_value(jnp.zeros(3)))
            pb.append(pf.zero_gradient())
            tb.append(pf.fixed_value(330.0))  # heated walls
    U = vol_vector(mesh, jnp.asarray([10.0, 0.0, 0.0]), name="U",
                   dims=dimVelocity, bcs=tuple(ub))
    p = vol_scalar(mesh, 1e5, name="p", dims=P_DIM, bcs=tuple(pb))
    T = vol_scalar(mesh, 300.0, name="T", dims=T_DIM, bcs=tuple(tb))
    cfg = rhopimple.RhoPimpleConfig(
        thermo=TH_V, steady=True, alpha_u=0.7, alpha_p=0.3, alpha_e=0.7)
    state = rhopimple.initial_state(mesh, U, p, T, TH_V, steady=True)
    step = jax.jit(lambda s, d: rhopimple.rhopimple_step(mesh, s, d, cfg))
    one = jnp.asarray(1.0, mesh.v.dtype)
    first = None
    for i in range(80):
        state, diag = step(state, one)
        if i == 0:
            first = float(np.max(np.asarray(diag["p_initial"])))
    last = float(np.max(np.asarray(diag["p_initial"])))
    assert last < 0.3 * first  # converging
    phi = np.asarray(state["phi"])
    nif = mesh.n_internal_faces
    act = np.asarray(mesh.face_active)[nif:]
    phib = phi[nif:] * act
    m_in = -phib[phib < 0].sum()
    m_out = phib[phib > 0].sum()
    assert abs(m_out - m_in) / m_in < 2e-3
    Td = np.asarray(state["T"].data)
    assert 299.0 < Td.min() and Td.max() < 331.0
    # heating downstream: outlet column warmer than inlet column
    Tg = Td.reshape(24, 8)
    assert Tg[-1].mean() > Tg[0].mean()


def test_sonicfoam_transonic_step_runs():
    """sonicFoam-style transonic pressure equation on the acoustic box:
    runs stably (implicit div(phid, p))."""
    mesh, U, p, T = _box_fields()
    cfg = rhopimple.RhoPimpleConfig(thermo=TH, transonic=True,
                                    n_outer=1, n_correctors=2)
    state = rhopimple.initial_state(mesh, U, p, T, TH)
    step = jax.jit(lambda s, d: rhopimple.rhopimple_step(mesh, s, d, cfg))
    dt = jnp.asarray(0.2 * 0.05 / 350.0, mesh.v.dtype)
    for _ in range(10):
        state, diag = step(state, dt)
    pd = np.asarray(state["p"].data)
    assert np.isfinite(pd).all()
    assert 0.9e5 < pd.min() and pd.max() < 1.1e5


def test_rhosimplec_consistent_matches_simple():
    """SIMPLEC (rhoSimplecFoam, consistent rAtU=1/(A-H1)): converges on
    the heated channel with LESS pressure under-relaxation (the whole
    point of the consistent formulation) to the same solution as
    rhoSimpleFoam."""
    TH_V = PerfectGas(R=287.0, Cv=717.5, mu=0.116)
    mesh = to_device(blockmesh.generate(parse_string(CHANNEL)))
    ub, pb, tb = [], [], []
    for pt in mesh.patches:
        if pt.type == "empty":
            for lst in (ub, pb, tb):
                lst.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif pt.name == "inlet":
            ub.append(pf.fixed_value(jnp.asarray([10.0, 0.0, 0.0])))
            pb.append(pf.zero_gradient())
            tb.append(pf.fixed_value(300.0))
        elif pt.name == "outlet":
            ub.append(pf.zero_gradient())
            pb.append(pf.fixed_value(1e5))
            tb.append(pf.zero_gradient())
        else:
            ub.append(pf.fixed_value(jnp.zeros(3)))
            pb.append(pf.zero_gradient())
            tb.append(pf.fixed_value(330.0))
    U = vol_vector(mesh, jnp.asarray([10.0, 0.0, 0.0]), name="U",
                   dims=dimVelocity, bcs=tuple(ub))
    p = vol_scalar(mesh, 1e5, name="p", dims=P_DIM, bcs=tuple(pb))
    T = vol_scalar(mesh, 300.0, name="T", dims=T_DIM, bcs=tuple(tb))

    def run(consistent, alpha_p):
        cfg = rhopimple.RhoPimpleConfig(
            thermo=TH_V, steady=True, consistent=consistent,
            alpha_u=0.7, alpha_p=alpha_p, alpha_e=0.7)
        state = rhopimple.initial_state(mesh, U, p, T, TH_V,
                                        steady=True)
        step = jax.jit(lambda s, d: rhopimple.rhopimple_step(
            mesh, s, d, cfg))
        one = jnp.asarray(1.0, mesh.v.dtype)
        for _ in range(80):
            state, diag = step(state, one)
        return state, diag

    st_c, dg_c = run(True, alpha_p=1.0)   # SIMPLEC: no p relaxation
    st_s, dg_s = run(False, alpha_p=0.3)
    # converged to the same velocity field
    du = float(np.max(np.abs(np.asarray(st_c["U"].data)
                             - np.asarray(st_s["U"].data))))
    assert du < 0.35, du                  # ~3% of the 10 m/s inlet
    # both conserve mass through the channel
    for st in (st_c, st_s):
        phi = np.asarray(st["phi"])
        nif = mesh.n_internal_faces
        phib = phi[nif:] * np.asarray(mesh.face_active)[nif:]
        m_in = -phib[phib < 0].sum()
        m_out = phib[phib > 0].sum()
        assert abs(m_out - m_in) / m_in < 5e-3
