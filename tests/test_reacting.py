"""reactingFoam tests (reference:
applications/solvers/combustion/reactingFoam/ with the laminar
combustion model)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity, dimless
from foamtpu.core.fields import vol_scalar, vol_vector, VolField
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models.chemistry import ChemistryModel
from foamtpu.models.thermo import PerfectGas
from foamtpu.solvers import reacting
from foamtpu.solvers.rhopimple import RhoPimpleConfig

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (0.1 0 0) (0.1 0.1 0) (0 0.1 0)
    (0 0 0.01) (0.1 0 0.01) (0.1 0.1 0.01) (0 0.1 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) (8 8 1) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((0 4 7 3) (2 6 5 1) (1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""

TH = PerfectGas(R=287.0, Cv=717.5, mu=1.8e-5)


def test_adiabatic_reactor_heat_release():
    """Closed box, quiescent exothermic A->B (equal W): the mixture
    burns to completion and T rises by the adiabatic increment
    dT = q_mass Y0 / cp, with mass and sum(Y)=1 conserved."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    bw, bzg = [], []
    for p in mesh.patches:
        if p.type == "empty":
            bw.append(pf.PatchField(kind="empty", vfrac=0.0))
            bzg.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bw.append(pf.fixed_value(jnp.zeros(3)))
            bzg.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(bw))
    p = vol_scalar(mesh, 1e5, name="p", dims=DimensionSet.of(1, -1, -2),
                   bcs=tuple(bzg))
    T = vol_scalar(mesh, 1000.0, name="T",
                   dims=DimensionSet.of(0, 0, 0, 1), bcs=tuple(bzg))
    nS = 2
    W = np.array([29.0, 29.0])
    hf_mol = np.array([2.9e7, 0.0])       # J/kmol -> q_mass = 1e6 J/kg
    chem = ChemistryModel.build(
        ["A", "B"],
        [{"lhs": [("A", 1.0)], "rhs": [("B", 1.0)],
          "A": 20.0, "beta": 0.0, "Ta": 1000.0}],
        hf=hf_mol)
    Y0A = 0.2
    Ydata = jnp.tile(jnp.asarray([Y0A, 1 - Y0A], mesh.v.dtype),
                     (mesh.n_cells, 1))
    Ybcs = tuple(pf.PatchField(kind="empty", vfrac=0.0)
                 if pt.type == "empty" else pf.zero_gradient()
                 for pt in mesh.patches)
    from foamtpu.bc.patchfields import normalize_bcs

    Y = VolField(data=Ydata, bcs=normalize_bcs(mesh, Ybcs, 0),
                 name="Y", dims=dimless)
    flow = RhoPimpleConfig(thermo=TH, n_outer=1, n_correctors=2,
                           div_scheme="linear")
    cfg = reacting.ReactingConfig(flow=flow, chem=chem, W=W)
    state = reacting.initial_state(mesh, U, p, T, Y, TH)
    v = np.asarray(mesh.v)
    m0 = float((np.asarray(state["rho0"]) * v).sum())
    step = jax.jit(lambda s, d: reacting.reacting_step(mesh, s, d, cfg))
    dt = jnp.asarray(2e-3, mesh.v.dtype)
    for _ in range(60):
        state, diag = step(state, dt)
    Yd = np.asarray(state["Y"].data)
    Td = np.asarray(state["T"].data)
    assert np.isfinite(Yd).all() and np.isfinite(Td).all()
    assert np.allclose(Yd.sum(axis=1), 1.0, atol=1e-5)
    # fuel consumed (k(1000K) ~ 7.4/s over 0.12 s => ~60% burn min)
    assert Yd[:, 0].max() < 0.45 * Y0A
    # adiabatic temperature rise toward q*Y0/cp; constant-volume closed
    # box heats even faster (cv), so expect at least the burned
    # fraction of the cp-based rise
    q_mass = 1e6
    dT_cp = q_mass * Y0A / TH.Cp
    burned = (Y0A - Yd[:, 0].mean()) / Y0A
    dT = Td.mean() - 1000.0
    assert dT > 0.7 * burned * dT_cp, (dT, burned, dT_cp)
    assert dT < 2.0 * dT_cp
    # mass conserved in the closed box
    m1 = float((np.asarray(state["rho0"]) * v).sum())
    assert abs(m1 - m0) / m0 < 5e-3


def test_reacting_mixture_thermo():
    """reactingMixture mode: the mixture gas constant and Cp respond
    to composition — converting a light species into a heavy one at
    constant rho and T lowers p = rho R(Y) T (reference:
    hePsiThermo<reactingMixture>)."""
    import numpy as np

    from foamtpu.solvers import reacting

    # two species: H2-like (W=2) and a heavy product (W=34)
    W = np.array([2.016, 34.0])
    # flat janaf: Cp/R = a0 constant (a0_light=3.5, a0_heavy=4.0)
    lo = np.array([[3.5, 0, 0, 0, 0, 0, 0],
                   [4.0, 0, 0, 0, 0, 0, 0]], float)
    cfg = reacting.ReactingConfig(
        flow=None, chem=None, W=W, cp_lo=lo, cp_hi=lo,
        t_common=np.array([1000.0, 1000.0]))
    Y_light = jnp.asarray([[1.0, 0.0]])
    Y_heavy = jnp.asarray([[0.0, 1.0]])
    T = jnp.asarray([300.0])
    R_l, cp_l = cfg.mixture_RCp(Y_light, T)
    R_h, cp_h = cfg.mixture_RCp(Y_heavy, T)
    assert abs(float(R_l[0]) - 8314.47 / 2.016) < 1.0
    assert abs(float(R_h[0]) - 8314.47 / 34.0) < 1.0
    assert abs(float(cp_l[0]) - 3.5 * 8314.47 / 2.016) < 5.0
    assert abs(float(cp_h[0]) - 4.0 * 8314.47 / 34.0) < 5.0
    # 50/50 mixture interpolates by mass fraction
    R_m, cp_m = cfg.mixture_RCp(jnp.asarray([[0.5, 0.5]]), T)
    assert abs(float(R_m[0])
               - 8314.47 * (0.5 / 2.016 + 0.5 / 34.0)) < 1.0
