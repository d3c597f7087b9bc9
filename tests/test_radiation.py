"""P1 radiation tests (reference:
src/thermophysicalModels/radiationModels/radiationModel/P1 +
MarshakRadiation BC)."""

import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet
from foamtpu.core.fields import vol_scalar
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models import radiation

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
    hot  { type wall; faces ((0 4 7 3)); }
    cold { type wall; faces ((2 6 5 1)); }
    other { type wall; faces ((1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""

T_DIM = DimensionSet.of(0, 0, 0, 1)


def _T_bcs(mesh, Th, Tc):
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.name == "hot":
            bcs.append(pf.fixed_value(Th))
        elif p.name == "cold":
            bcs.append(pf.fixed_value(Tc))
        else:
            bcs.append(pf.fixed_value(0.5 * (Th + Tc)))
    return tuple(bcs)


def test_p1_isothermal_equilibrium():
    """Isothermal medium + walls at the same temperature: the exact P1
    solution is G = 4 sigma T^4 everywhere, and Sh = 0."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    T0 = 800.0
    Tb = _T_bcs(mesh, T0, T0)
    cfg = radiation.P1Config(a=2.0, e=2.0, s=0.0, emissivity=1.0,
                             g_controls={"solver": "PCG",
                                         "preconditioner": "polynomial",
                                         "tolerance": 1e-6,
                                         "relTol": 1e-5,
                                         "maxIter": 5000})
    G = radiation.make_G(mesh, cfg, Tb)
    Tf = jnp.full(mesh.n_cells, T0, mesh.v.dtype)
    G, perf = radiation.solve_G(mesh, G, Tf, cfg)
    exact = 4.0 * radiation.SIGMA * T0 ** 4
    g = np.asarray(G.data)
    assert np.abs(g - exact).max() / exact < 1e-3, (
        g.min(), g.max(), exact)
    sh = np.asarray(radiation.Sh(mesh, G, Tf, cfg))
    assert np.abs(sh).max() < 1e-3 * cfg.a * exact


def test_p1_hot_cold_walls_bounded_and_directed():
    """Hot wall 1000 K / cold wall 500 K, medium at 750 K: G bounded by
    the wall black-body limits, decreasing from hot to cold, and the
    radiative source heats gas near the cold side of the field."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    Th, Tc, Tm = 1000.0, 500.0, 750.0
    Tb = _T_bcs(mesh, Th, Tc)
    cfg = radiation.P1Config(a=1.0, e=1.0, s=0.0, emissivity=1.0)
    G = radiation.make_G(mesh, cfg, Tb)
    Tf = jnp.full(mesh.n_cells, Tm, mesh.v.dtype)
    G, perf = radiation.solve_G(mesh, G, Tf, cfg)
    g = np.asarray(G.data)
    lo = 4.0 * radiation.SIGMA * Tc ** 4
    hi = 4.0 * radiation.SIGMA * Th ** 4
    assert (g > 0.8 * lo).all() and (g < 1.05 * hi).all()
    c = np.asarray(mesh.c)
    left = g[c[:, 0] < 0.2].mean()
    right = g[c[:, 0] > 0.8].mean()
    assert left > right * 1.1          # monotone hot -> cold
    # energy exchange: the hot wall region pumps energy INTO the 750K
    # gas (Sh > 0 near the hot wall)
    sh = np.asarray(radiation.Sh(mesh, G, Tf, cfg))
    assert sh[c[:, 0] < 0.1].mean() > 0


def test_buoyant_with_radiation_couples():
    """buoyantSimpleFoam with P1 radiation: hot-wall radiation heats
    the gas beyond the pure-conduction solution."""
    import jax

    from foamtpu.core.fields import vol_scalar, vol_vector
    from foamtpu.core.dimensions import dimVelocity
    from foamtpu.models.thermo import PerfectGas
    from foamtpu.models import radiation as rad_mod
    from foamtpu.solvers import buoyantrho

    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    TH = PerfectGas(R=287.0, Cv=717.5, mu=5e-4)
    Th, Tc = 1000.0, 500.0
    ub, pb = [], []
    for p in mesh.patches:
        if p.type == "empty":
            ub.append(pf.PatchField(kind="empty", vfrac=0.0))
            pb.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            ub.append(pf.fixed_value(jnp.zeros(3)))
            pb.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(ub))
    p_rgh = vol_scalar(mesh, 1e5, name="p_rgh",
                       dims=DimensionSet.of(1, -1, -2), bcs=tuple(pb))
    Tb = _T_bcs(mesh, Th, Tc)
    T = vol_scalar(mesh, 750.0, name="T", dims=T_DIM, bcs=Tb)

    def run(rad):
        cfg = buoyantrho.BuoyantRhoConfig(
            thermo=TH, steady=True, g=(0.0, 0.0, 0.0),
            alpha_u=0.5, alpha_p=0.7, alpha_e=0.5, radiation=rad)
        st = buoyantrho.initial_state(mesh, U, p_rgh, T, TH,
                                      g=cfg.g, steady=True)
        if rad is not None:
            st["G"] = rad_mod.make_G(mesh, rad, Tb)
        step = jax.jit(
            lambda s, d: buoyantrho.buoyantrho_step(mesh, s, d, cfg))
        one = jnp.asarray(1.0, mesh.v.dtype)
        for _ in range(80):
            st, diag = step(st, one)
        return np.asarray(st["T"].data)

    T_cond = run(None)
    T_rad = run(rad_mod.P1Config(a=5.0, e=5.0, emissivity=1.0))
    assert np.isfinite(T_rad).all()
    # radiation transports extra energy from the 1000K wall into the
    # gas: the mean temperature rises vs pure conduction
    assert T_rad.mean() > T_cond.mean() + 5.0, (
        T_cond.mean(), T_rad.mean())
    # bounded by the wall temperatures (small corner overshoot from the
    # partially-converged 80-iteration steady march is tolerated)
    assert T_rad.max() < 1.05 * Th and T_rad.min() > 0.95 * Tc


# ---------------------------------------------------------------------------
# fvDOM (reference: radiationModels/fvDOM/)
# ---------------------------------------------------------------------------


def test_fvdom_isothermal_equilibrium():
    """Isothermal black enclosure at T0: every ray carries I =
    sigma T0^4 / pi, so G = 4 sigma T0^4 exactly (the discrete weights
    sum to 4 pi)."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    T0 = 800.0
    Tb = _T_bcs(mesh, T0, T0)
    cfg = radiation.FvDOMConfig(a=1.0, e=1.0, emissivity=1.0,
                                n_theta=2, n_phi=1)
    G = radiation.make_G(mesh, cfg, Tb)
    Tf = jnp.full(mesh.n_cells, T0, mesh.v.dtype)
    G, perf = radiation.solve_G(mesh, G, Tf, cfg, T_bcs=Tb)
    exact = 4.0 * radiation.SIGMA * T0 ** 4
    g = np.asarray(G.data)
    assert np.abs(g - exact).max() / exact < 1e-2, (g.min(), g.max(), exact)
    sh = np.asarray(radiation.Sh(mesh, G, Tf, cfg))
    assert np.abs(sh).max() < 1e-2 * cfg.a * exact


def test_fvdom_transparent_two_plate():
    """Nearly transparent medium between hot/cold black plates: at any
    interior point each half-space is filled by one wall's intensity,
    G ~ 2 sigma (Th^4 + Tc^4); monotone decrease hot -> cold in the
    net flux sense is reflected in G's x-gradient being small (G is
    nearly uniform) while rays differ."""
    mesh = to_device(blockmesh.generate(parse_string(BOX)))
    Th, Tc = 1000.0, 500.0
    Tb = _T_bcs(mesh, Th, Tc)
    # side walls ~ average to mimic periodic plates; small absorption
    cfg = radiation.FvDOMConfig(a=1e-4, e=1e-4, emissivity=1.0,
                                n_theta=4, n_phi=2)
    G = radiation.make_G(mesh, cfg, Tb)
    Tf = jnp.full(mesh.n_cells, 300.0, mesh.v.dtype)   # cold medium
    G, _ = radiation.solve_G(mesh, G, Tf, cfg, T_bcs=Tb)
    g = np.asarray(G.data)
    cc = np.asarray(mesh.c)
    mid = np.abs(cc[:, 1] - 0.5) < 0.2
    approx = 2.0 * radiation.SIGMA * (Th ** 4 + Tc ** 4)
    # generous band: ray effects + side-wall average emission
    assert 0.6 * approx < g[mid].mean() < 1.4 * approx, (
        g[mid].mean(), approx)
    assert np.isfinite(g).all() and (g >= 0).all()


# ---------------------------------------------------------------------------
# viewFactor (reference: radiationModels/viewFactor)
# ---------------------------------------------------------------------------


def test_viewfactor_parallel_plates():
    """Two large parallel plates at T1/T2 with emissivities e1/e2: the
    net exchange must match the textbook
    q = sigma (T1^4 - T2^4) / (1/e1 + 1/e2 - 1)."""
    import numpy as np
    import jax.numpy as jnp

    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh, to_device
    from foamtpu.models import radiation as rad

    # thin gap between two 1x1 plates (gap 0.01 -> F12 ~ 1)
    BM = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.01) (1 0 0.01) (1 1 0.01) (0 1 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) (16 16 1) simpleGrading (1 1 1) );
boundary
(
    bottom { type wall; faces ((0 3 2 1)); }
    top    { type wall; faces ((4 5 6 7)); }
    sides  { type patch; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                                (3 7 6 2)); }
);
"""
    mesh = to_device(blockmesh.generate(parse_string(BM)))
    e1, e2 = 0.8, 0.6
    # per-face emissivity: bottom faces then top faces in fid order
    vf = rad.make_viewfactor(mesh, ("bottom", "top"), emissivity=1.0)
    nfh = vf.faces.shape[0] // 2
    eps = np.full(vf.faces.shape[0], e1)
    eps[nfh:] = e2
    vf = vf._replace(emissivity=jnp.asarray(eps, mesh.v.dtype))
    T1, T2 = 600.0, 300.0
    Tf = np.full(vf.faces.shape[0], T1)
    Tf[nfh:] = T2
    q = np.asarray(rad.viewfactor_heat_flux(
        vf, jnp.asarray(Tf, mesh.v.dtype)))
    q_exact = rad.SIGMA_SB * (T1 ** 4 - T2 ** 4) / (1 / e1 + 1 / e2 - 1)
    # hot plate LOSES q_exact per unit area; cold plate gains it
    q_hot = -q[:nfh].mean()
    q_cold = q[nfh:].mean()
    assert abs(q_hot - q_exact) / q_exact < 0.08, (q_hot, q_exact)
    assert abs(q_cold - q_exact) / q_exact < 0.08
    # energy conservation: total net exchange sums to ~0
    tot = float((q * np.asarray(vf.areas)).sum())
    assert abs(tot) < 1e-3 * q_exact * float(np.asarray(
        vf.areas)[:nfh].sum())


def test_viewfactor_rows_normalised_and_equilibrium():
    import numpy as np
    import jax.numpy as jnp

    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh, to_device
    from foamtpu.models import radiation as rad

    BM = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (4 4 4) simpleGrading (1 1 1) );
boundary
(
    walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                              (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""
    mesh = to_device(blockmesh.generate(parse_string(BM)))
    vf = rad.make_viewfactor(mesh, ("walls",), emissivity=0.7)
    F = np.asarray(vf.F)
    assert np.allclose(F.sum(axis=1), 1.0, atol=1e-6)
    # isothermal enclosure: zero net flux everywhere
    T = jnp.full(vf.faces.shape[0], 450.0, mesh.v.dtype)
    q = np.asarray(rad.viewfactor_heat_flux(vf, T))
    assert np.max(np.abs(q)) < 1e-2
