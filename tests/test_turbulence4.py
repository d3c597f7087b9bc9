"""Round-3 turbulence batch #4: cubic Lien family, Lien-Leschziner
low-Re, SA-IDDES, and the differential-stress / localized-dynamic LES
closures. Oracles: positivity/boundedness, wall damping, length-scale
blending limits, and stress-transport realizability."""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import FoamDict, Word
from foamtpu.core.dimensions import DimensionSet as DS
from foamtpu.core.dimensions import dimViscosity
from foamtpu.core.fields import vol_scalar
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models.turbulence import select
from foamtpu.solvers import piso

from test_turbulence import NU, _props, channel_fields
from test_turbulence2 import _channel_poly, _lowre_fields, _run_steady


@pytest.mark.parametrize("name", ["LienCubicKE", "LienCubicKELowRe",
                                  "LienLeschzinerLowRe"])
def test_lien_family_channel(name):
    poly = _channel_poly(nx=30, ny=16)
    mesh = to_device(poly)
    k0 = 1.5 * 0.05 ** 2
    eps0 = 0.09 ** 0.75 * k0 ** 1.5 / 0.01
    U, p, k, eps, nut = _lowre_fields(mesh, k0, eps0)
    model = select(_props(name), NU)
    if hasattr(model, "init_wall_distance"):
        model.init_wall_distance(poly, np.asarray(mesh.v).dtype)
    state, diag = _run_steady(mesh, U, p,
                              {"k": k, "epsilon": eps, "nut": nut},
                              model, n=60)
    kk = np.asarray(state["turb"]["k"].data)
    ee = np.asarray(state["turb"]["epsilon"].data)
    nn = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(kk).all() and (kk > 0).all() and (ee > 0).all()
    assert (nn >= 0).all() and np.isfinite(nn).all()
    assert float(diag["continuity"]) < 3e-3
    if name.endswith("LowRe"):
        # wall damping: wall-adjacent nut below the channel core's
        nut_grid = nn.reshape(30, 16)
        assert nut_grid[:, 0].mean() < nut_grid[:, 8].mean() + 1e-12


def test_lien_cubic_reduces_to_quadratic_at_weak_strain():
    """At vanishing strain/vorticity the cubic viscosity correction
    disappears: Cmu_eff -> Cmu_var (reference: LienCubicKE
    C5viscosity_ ~ k^4/eps^3 * invariants)."""
    from foamtpu.models.turbulence.ras4 import LienCubicKE

    m = LienCubicKE(NU)
    zero = jnp.zeros((5,))
    cmu0 = np.asarray(m._cmu_var(zero, zero))
    cmu_eff = np.asarray(m._cmu_eff(zero, zero))
    np.testing.assert_allclose(cmu_eff, cmu0, rtol=1e-6)
    # strain-dominated invariants reduce the effective viscosity
    eta = jnp.full((5,), 3.0)
    assert (np.asarray(m._cmu_eff(eta, zero))
            < np.asarray(m._cmu_var(eta, zero))).all()
    # rotation-dominated invariants raise it (bounded by the clip)
    assert (np.asarray(m._cmu_eff(zero, eta))
            >= np.asarray(m._cmu_var(zero, eta))).all()


def test_sa_iddes_length_scale_limits():
    """IDDES dTilda: equals the RANS wall distance deep inside a
    shielded boundary layer (rdt large), and approaches CDES*delta in
    calm far-field LES-mode cells (reference:
    SpalartAllmarasIDDES.C dTilda())."""
    from foamtpu.core.dictionary import parse_string as _ps
    from foamtpu.core.dimensions import dimVelocity
    from foamtpu.core.fields import vol_vector
    from foamtpu.models.turbulence.ras4 import SpalartAllmarasIDDES

    d = _ps('''
vertices (
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 0.05) (1 0 0.05) (1 1 0.05) (0 1 0.05)
);
blocks ( hex (0 1 2 3 4 5 6 7) (16 16 1) simpleGrading (1 1 1) );
boundary (
    walls { type wall; faces ((1 5 4 0) (0 4 7 3)); }
    top { type patch; faces ((3 7 6 2) (2 6 5 1)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
''')
    pm = blockmesh.generate(d)
    mesh = to_device(pm)
    m = SpalartAllmarasIDDES(nu=1e-5)
    m.init_wall_distance(pm, np.float32)
    bcs = []
    for patch in mesh.patches:
        if patch.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs.append(pf.zero_gradient())
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U", dims=dimVelocity,
                   bcs=tuple(bcs))
    nuT = vol_scalar(mesh, 1e-3, name="nuTilda", dims=dimViscosity,
                     bcs=tuple(bcs))
    dt = np.asarray(m.d_tilda(mesh, U, nuT))
    y = np.asarray(m.y_wall)
    cdelta = np.asarray(m._cdes_delta)
    assert np.isfinite(dt).all() and (dt > 0).all()
    # with zero velocity gradient rdt saturates -> fdt ~ 0, fd=1 near
    # the wall (alpha>0 -> fB~1 there too): RANS branch
    near = y < 0.1
    np.testing.assert_allclose(dt[near] / ((1 + 0.0) * y[near]), 1.0,
                               rtol=0.35)
    # everywhere dTilda is bounded by the pure-RANS scale inflated by
    # the wall-modeled-LES fe term and below max(y, CDES delta)
    assert (dt <= np.maximum(2.0 * y, cdelta) + 1e-7).all()


def _les_run(model_name, tstate_extra, n=8):
    mesh = to_device(_channel_poly())
    U, p, tstate0 = channel_fields(mesh)
    tstate = {"nut": tstate0["nut"]}
    tstate.update(tstate_extra(mesh, tstate0))
    props = FoamDict()
    props[Word("LESModel")] = Word(model_name)
    model = select(props, NU, kind="LES")
    cfg = piso.PisoConfig(
        nu=NU, n_correctors=2, div_scheme="limitedLinear 1",
        p_controls={"solver": "PCG", "tolerance": 1e-7, "relTol": 0.0},
        u_controls={"solver": "PBiCGStab", "tolerance": 1e-7,
                    "relTol": 0.0},
        turb=model,
    )
    step = piso.make_step(mesh, cfg)
    state = piso.initial_state(mesh, U, p, turb_state=tstate)
    dt = jnp.asarray(0.02, mesh.v.dtype)
    for _ in range(n):
        state, diag = step(state, dt)
    return state, diag


def _with_k(mesh, tstate0):
    return {"k": tstate0["k"]}


def _with_B(mesh, tstate0):
    k0 = tstate0["k"].data
    nbp = len(mesh.patches)
    B0 = jnp.stack([2.0 / 3.0 * k0, 0 * k0, 0 * k0,
                    2.0 / 3.0 * k0, 0 * k0, 2.0 / 3.0 * k0], axis=1)
    bcs = []
    for patch in mesh.patches:
        if patch.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs.append(pf.zero_gradient())
    from foamtpu.core.fields import VolField

    B = VolField(data=B0, name="B", dims=DS.of(0, 2, -2),
                 bcs=tuple(bcs))
    return {"B": B, "k": tstate0["k"]}


@pytest.mark.parametrize("name,extra", [
    ("locDynOneEqEddy", _with_k),
    ("dynMixedSmagorinsky", lambda m, t: {}),
    ("DeardorffDiffStress", _with_B),
    ("LRDDiffStress", _with_B),
])
def test_les_batch4_channel(name, extra):
    state, diag = _les_run(name, extra)
    u = np.asarray(state["U"].data)
    nut = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(u).all() and np.isfinite(nut).all()
    assert (nut >= 0).all()
    assert float(diag["continuity"]) < 1e-3
    assert np.abs(u).max() < 3.0
    if name.endswith("DiffStress"):
        B = np.asarray(state["turb"]["B"].data)
        # realizability: positive normal stresses, finite shear
        assert (B[:, [0, 3, 5]] > 0).all() and np.isfinite(B).all()
        k = np.asarray(state["turb"]["k"].data)
        np.testing.assert_allclose(
            k, 0.5 * (B[:, 0] + B[:, 3] + B[:, 5]), rtol=1e-5)


def test_spect_eddy_visc_channel():
    state, diag = _les_run("spectEddyVisc", lambda m, t: {})
    nut = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(nut).all() and (nut >= 0).all()
    assert float(diag["continuity"]) < 1e-3


def test_spect_eddy_visc_k_vanishes_in_calm_flow():
    """The spectral integral gives k -> 0 when the resolved
    dissipation estimate is tiny (reference: spectEddyVisc.C)."""
    mesh = to_device(_channel_poly(nx=8, ny=4))
    from foamtpu.core.dimensions import dimVelocity
    from foamtpu.core.fields import vol_vector
    from foamtpu.models.turbulence.les4 import SpectEddyVisc

    m = SpectEddyVisc(NU)
    bcs = tuple(
        pf.PatchField(kind="empty", vfrac=0.0) if p.type == "empty"
        else pf.zero_gradient() for p in mesh.patches)
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U", dims=dimVelocity,
                   bcs=bcs)
    nut = vol_scalar(mesh, 0.0, name="nut", dims=dimViscosity, bcs=bcs)
    new, _ = m.correct(mesh, {"nut": nut}, U, None,
                       jnp.asarray(0.01, mesh.v.dtype))
    assert np.asarray(new["nut"].data).max() < 1e-6


def _kklomega_fields(mesh, k0, w0):
    """kT = kL = 0 fixedValue at walls, omega zeroGradient — the
    wall-integrated transitional setup."""
    def pface(patch, v):
        return jnp.broadcast_to(jnp.asarray(v), (patch.size,))

    U, p, _ = channel_fields(mesh)
    ktbcs, klbcs, wbcs, nutbcs = [], [], [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            for lst in (ktbcs, klbcs, wbcs, nutbcs):
                lst.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "inlet":
            ktbcs.append(pf.fixed_value(pface(patch, k0)))
            klbcs.append(pf.fixed_value(pface(patch, k0)))
            wbcs.append(pf.fixed_value(pface(patch, w0)))
            nutbcs.append(pf.make("calculated",
                                  ref_value=pface(patch, 0.0)))
        elif patch.name == "outlet":
            for lst in (ktbcs, klbcs, wbcs):
                lst.append(pf.zero_gradient())
            nutbcs.append(pf.make("calculated",
                                  ref_value=pface(patch, 0.0)))
        else:
            ktbcs.append(pf.fixed_value(pface(patch, 0.0)))
            klbcs.append(pf.fixed_value(pface(patch, 0.0)))
            wbcs.append(pf.zero_gradient())
            nutbcs.append(pf.make("calculated",
                                  ref_value=pface(patch, 0.0)))
    kt = vol_scalar(mesh, k0, name="kt", dims=DS.of(0, 2, -2),
                    bcs=tuple(ktbcs))
    kl = vol_scalar(mesh, 1e-8, name="kl", dims=DS.of(0, 2, -2),
                    bcs=tuple(klbcs))
    om = vol_scalar(mesh, w0, name="omega", dims=DS.of(0, 0, -1),
                    bcs=tuple(wbcs))
    nut = vol_scalar(mesh, 0.0, name="nut", dims=dimViscosity,
                     bcs=tuple(nutbcs))
    return U, p, kt, kl, om, nut


def test_kklomega_channel():
    """Transitional channel: kT/kL/omega stay positive and finite,
    nut bounded, laminar kinetic energy develops in the sheared
    near-wall region (reference: RAS/kkLOmega; Walters & Cokljat
    2008)."""
    poly = _channel_poly(nx=30, ny=16)
    mesh = to_device(poly)
    k0 = 1.5 * 0.05 ** 2
    w0 = k0 ** 0.5 / 0.01
    U, p, kt, kl, om, nut = _kklomega_fields(mesh, k0, w0)
    model = select(_props("kkLOmega"), NU)
    model.init_wall_distance(poly, np.asarray(mesh.v).dtype)
    state, diag = _run_steady(
        mesh, U, p, {"kt": kt, "kl": kl, "omega": om, "nut": nut},
        model, n=60)
    ktv = np.asarray(state["turb"]["kt"].data)
    klv = np.asarray(state["turb"]["kl"].data)
    wv = np.asarray(state["turb"]["omega"].data)
    nn = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(ktv).all() and (ktv > 0).all()
    assert np.isfinite(klv).all() and (klv > 0).all()
    assert np.isfinite(wv).all() and (wv > 0).all()
    assert np.isfinite(nn).all() and (nn >= 0).all()
    assert float(diag["continuity"]) < 3e-3
    # laminar kinetic energy is produced by shear above its floor
    assert klv.max() > 1e-7
