"""solidThermo property library tests (reference:
src/thermophysicalModels/solidThermo/ + solidSpecie/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet
from foamtpu.core.fields import vol_scalar
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models import solidthermo as sth
from foamtpu.solvers import chtmultiregion as cht

T_DIM = DimensionSet.of(0, 0, 0, 1)


def _bar(n=40):
    d = parse_string(f"""
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 0.1 0) (0 0.1 0)
    (0 0 0.1) (1 0 0.1) (1 0.1 0.1) (0 0.1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) ({n} 1 1) simpleGrading (1 1 1) );
boundary
(
    left  {{ type wall; faces ((0 4 7 3)); }}
    right {{ type wall; faces ((2 6 5 1)); }}
    walls {{ type empty; faces ((1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); }}
);
""")
    return to_device(blockmesh.generate(d))


def _T_field(mesh, t_left, t_right, init=350.0):
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.name == "left":
            bcs.append(pf.fixed_value(t_left))
        elif p.name == "right":
            bcs.append(pf.fixed_value(t_right))
        else:
            bcs.append(pf.zero_gradient())
    return vol_scalar(mesh, init, name="T", dims=T_DIM, bcs=tuple(bcs))


# ---------------------------------------------------------------------------
# property menu
# ---------------------------------------------------------------------------


def test_property_menu():
    T = jnp.asarray([300.0, 400.0, 600.0])
    # constIso / hConst / rhoConst
    st = sth.SolidThermo("constIso", "hConst", 8000.0, (80.0,), (450.0,))
    assert np.allclose(st.kappa(T), 80.0)
    assert np.allclose(st.cp(T), 450.0)
    assert np.allclose(st.rho(T), 8000.0)
    # polynomial transport (reference: polynomialSolidTransport::kappa)
    stp = sth.SolidThermo("polynomial", "hPolynomial", 2000.0,
                          (10.0, 0.05), (100.0, 1.0, 0.001))
    assert np.allclose(stp.kappa(T), 10.0 + 0.05 * np.asarray(T))
    Tn = np.asarray(T)
    assert np.allclose(stp.cp(T), 100.0 + Tn + 0.001 * Tn * Tn)
    # exponential transport kappa0*(T/Tref)^n
    ste = sth.SolidThermo("exponential", "hPower", 2000.0, (50.0,),
                          (300.0,), Tref=300.0, n_exp=1.5)
    assert np.allclose(ste.kappa(T), 50.0 * (Tn / 300.0) ** 1.5,
                       rtol=1e-6)
    assert np.allclose(ste.cp(T), 300.0 * (Tn / 300.0) ** 1.5,
                       rtol=1e-6)


def test_aniso_kappa_face_axis_aligned():
    """constAnIso on an axis-aligned mesh: x faces see k1, the tensor
    is diag(k1,k2,k3) in identity axes (reference:
    constAnIsoSolidTransport + gaussLaplacianScheme tensor-gamma
    reduction n.K.n)."""
    mesh = _bar(8)
    st = sth.SolidThermo("constAnIso", "hConst", 8000.0,
                         (30.0, 7.0, 2.0), (450.0,))
    K = np.asarray(st.kappa_tensor())
    assert np.allclose(K, np.diag([30.0, 7.0, 2.0]))
    kf = np.asarray(st.kappa_face(mesh, jnp.zeros(mesh.n_cells)))
    nf = np.asarray(mesh.sf) / np.maximum(np.asarray(mesh.mag_sf),
                                          1e-30)[:, None]
    x_faces = np.abs(nf[:, 0]) > 0.99
    assert np.allclose(kf[x_faces], 30.0)
    # rotated axes: e1=(0 1 0) puts k1 on the y direction
    st2 = sth.SolidThermo("constAnIso", "hConst", 8000.0,
                          (30.0, 7.0, 2.0), (450.0,),
                          aniso_axes=((0, 1, 0), (-1, 0, 0), (0, 0, 1)))
    K2 = np.asarray(st2.kappa_tensor())
    assert np.allclose(np.sort(np.linalg.eigvalsh(K2)),
                       [2.0, 7.0, 30.0], atol=1e-12)
    assert np.isclose(K2[1, 1], 30.0) and np.isclose(K2[0, 0], 7.0)


# ---------------------------------------------------------------------------
# dictionary parsing
# ---------------------------------------------------------------------------


def test_from_dict_reference_layout():
    tp = parse_string("""
thermoType
{
    type            heSolidThermo;
    mixture         pureMixture;
    transport       exponential;
    thermo          hPower;
    equationOfState rhoConst;
    specie          specie;
    energy          sensibleEnthalpy;
}
mixture
{
    transport { kappa0 40; n0 1; Tref 300; }
    thermodynamics { C0 556; n0 1; Tref 300; }
    equationOfState { rho 7700; }
}
""")
    st = sth.from_dict(tp)
    assert st.transport == "exponential" and st.thermo == "hPower"
    assert st.rho0 == 7700.0
    assert np.isclose(float(st.kappa(jnp.asarray([600.0]))[0]), 80.0)


def test_from_dict_polynomial_and_flat():
    tp = parse_string("""
thermoType { transport polynomial; thermo hPolynomial; }
mixture
{
    transport { kappaCoeffs<8> (10 0.05 0 0 0 0 0 0); }
    thermodynamics { CpCoeffs<8> (100 1 0 0 0 0 0 0); }
    equationOfState { rho 3000; }
}
""")
    st = sth.from_dict(tp)
    assert np.isclose(float(st.kappa(jnp.asarray([200.0]))[0]), 20.0)
    assert np.isclose(float(st.cp(jnp.asarray([200.0]))[0]), 300.0)
    # legacy flat form
    tpf = parse_string("rho rho [1 -3 0 0 0] 7000;\n"
                       "Cp Cp [0 2 -2 -1 0] 500;\n"
                       "kappa kappa [1 1 -3 -1 0] 25;\n")
    stf = sth.from_dict(tpf)
    assert (stf.rho0, stf.cp_c[0], stf.kappa_c[0]) == (7000.0, 500.0,
                                                       25.0)


# ---------------------------------------------------------------------------
# conduction physics through solid_step
# ---------------------------------------------------------------------------


def test_variable_kappa_steady_slab_kirchhoff():
    """Steady 1-D slab with kappa = k0*(T/Tref): the converged profile
    satisfies the Kirchhoff transform T(x) = sqrt(T1^2+(T2^2-T1^2)x/L)
    (constant flux with T-linear conductivity)."""
    mesh = _bar(40)
    st = sth.SolidThermo("exponential", "hConst", 8000.0, (50.0,),
                         (450.0,), Tref=300.0, n_exp=1.0)
    T = _T_field(mesh, 400.0, 300.0)
    cfg = cht.SolidConfig(rho=st.rho0, cp=450.0, kappa=50.0,
                          steady=True, thermo=st)
    step = jax.jit(lambda T: cht.solid_step(mesh, T, T.data, 1.0, cfg))
    for _ in range(60):   # property-lagged outer iteration
        T, perf = step(T)
        T = T.correct_boundary_conditions(mesh)
    x = np.asarray(mesh.c)[:, 0]
    exact = np.sqrt(400.0 ** 2 + (300.0 ** 2 - 400.0 ** 2) * x)
    assert np.allclose(np.asarray(T.data), exact, rtol=2e-3)


def test_constant_thermo_path_parity():
    """A constIso/hConst SolidThermo through the variable-property path
    must match the constant-path transient solve."""
    mesh = _bar(24)
    st = sth.SolidThermo("constIso", "hConst", 8000.0, (80.0,), (450.0,))
    cfg_c = cht.SolidConfig(rho=8000.0, cp=450.0, kappa=80.0)
    cfg_v = cfg_c._replace(thermo=st)
    T = _T_field(mesh, 400.0, 300.0)
    dt = 50.0
    Tc, Tv = T, T
    for _ in range(5):
        Tc2, _ = cht.solid_step(mesh, Tc, Tc.data, dt, cfg_c)
        Tv2, _ = cht.solid_step(mesh, Tv, Tv.data, dt, cfg_v)
        Tc = Tc2.correct_boundary_conditions(mesh)
        Tv = Tv2.correct_boundary_conditions(mesh)
    assert np.allclose(np.asarray(Tc.data), np.asarray(Tv.data),
                       atol=1e-4)


def test_aniso_steady_flux_uses_k1():
    """constAnIso bar conducting along x: steady heat flux equals
    k1*dT/dx regardless of k2/k3."""
    mesh = _bar(20)
    st = sth.SolidThermo("constAnIso", "hConst", 8000.0,
                         (30.0, 999.0, 999.0), (450.0,))
    T = _T_field(mesh, 400.0, 300.0)
    cfg = cht.SolidConfig(rho=st.rho0, cp=450.0, kappa=30.0,
                          steady=True, thermo=st,
                          t_controls={"solver": "PCG",
                                      "preconditioner": "polynomial",
                                      "tolerance": 1e-9, "relTol": 0.0,
                                      "maxIter": 2000})
    T2, _ = cht.solid_step(mesh, T, T.data, 1.0, cfg)
    T2 = T2.correct_boundary_conditions(mesh)
    x = np.asarray(mesh.c)[:, 0]
    assert np.allclose(np.asarray(T2.data), 400.0 - 100.0 * x,
                       atol=1e-3)
