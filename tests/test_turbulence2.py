"""Round-3 turbulence additions: low-Re k-epsilon variants
(LamBremhorstKE, qZeta), v2-f, Reynolds-stress transport (LRR,
LaunderGibsonRSTM), SST-SAS, and the dynamic/scale-similarity LES
family. Oracles: physics invariants — positivity, boundedness,
continuity, profile shape."""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import FoamDict, Word
from foamtpu.core.dimensions import DimensionSet as DS
from foamtpu.core.dimensions import dimViscosity
from foamtpu.core.fields import VolField, vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.models.turbulence import select
from foamtpu.solvers import piso, simple

from test_turbulence import NU, channel_fields, channel_mesh, _props


def _channel_poly(nx=30, ny=10):
    from foamtpu.core.dictionary import parse_string

    d = parse_string(f"""
vertices (
    (0 0 0) (2 0 0) (2 0.1 0) (0 0.1 0)
    (0 0 0.01) (2 0 0.01) (2 0.1 0.01) (0 0.1 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) ({nx} {ny} 1) simpleGrading (1 1 1) );
boundary (
    inlet {{ type patch; faces ((0 4 7 3)); }}
    outlet {{ type patch; faces ((2 6 5 1)); }}
    walls {{ type wall; faces ((1 5 4 0) (3 7 6 2)); }}
    frontAndBack {{ type empty; faces ((0 3 2 1) (4 5 6 7)); }}
);
""")
    return blockmesh.generate(d)


def _lowre_fields(mesh, k0, eps0):
    """k=0 fixedValue at walls, eps zeroGradient — the low-Re setup."""
    def pface(patch, v):
        return jnp.broadcast_to(jnp.asarray(v), (patch.size,))

    U, p, _ = channel_fields(mesh)
    kbcs, ebcs, nutbcs = [], [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            for lst in (kbcs, ebcs, nutbcs):
                lst.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "inlet":
            kbcs.append(pf.fixed_value(pface(patch, k0)))
            ebcs.append(pf.fixed_value(pface(patch, eps0)))
            nutbcs.append(pf.make("calculated", ref_value=pface(patch, 0.0)))
        elif patch.name == "outlet":
            kbcs.append(pf.zero_gradient())
            ebcs.append(pf.zero_gradient())
            nutbcs.append(pf.make("calculated", ref_value=pface(patch, 0.0)))
        else:
            kbcs.append(pf.fixed_value(pface(patch, 0.0)))
            ebcs.append(pf.zero_gradient())
            nutbcs.append(pf.make("calculated", ref_value=pface(patch, 0.0)))
    k = vol_scalar(mesh, k0, name="k", dims=DS.of(0, 2, -2), bcs=tuple(kbcs))
    eps = vol_scalar(mesh, eps0, name="epsilon", dims=DS.of(0, 2, -3),
                     bcs=tuple(ebcs))
    nut = vol_scalar(mesh, 0.0, name="nut", dims=dimViscosity,
                     bcs=tuple(nutbcs))
    return U, p, k, eps, nut


def _simple_cfg(model):
    return simple.SimpleConfig(
        nu=NU, alpha_u=0.7, alpha_p=0.3, div_scheme="limitedLinear 1",
        p_controls={"solver": "PCG", "tolerance": 1e-7, "relTol": 0.01},
        u_controls={"solver": "PBiCGStab", "tolerance": 1e-7, "relTol": 0.1},
        turb=model,
    )


def _run_steady(mesh, U, p, tstate, model, n=50):
    step = simple.make_step(mesh, _simple_cfg(model))
    state = piso.initial_state(mesh, U, p, turb_state=tstate)
    for _ in range(n):
        state, diag = step(state)
    return state, diag


def test_lam_bremhorst_channel():
    poly = _channel_poly(nx=30, ny=16)
    mesh = to_device(poly)
    k0 = 1.5 * 0.05 ** 2
    eps0 = 0.09 ** 0.75 * k0 ** 1.5 / 0.01
    U, p, k, eps, nut = _lowre_fields(mesh, k0, eps0)
    model = select(_props("LamBremhorstKE"), NU)
    model.init_wall_distance(poly, np.asarray(mesh.v).dtype)
    state, diag = _run_steady(mesh, U, p,
                              {"k": k, "epsilon": eps, "nut": nut}, model)
    kk = np.asarray(state["turb"]["k"].data)
    ee = np.asarray(state["turb"]["epsilon"].data)
    nn = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(kk).all() and (kk > 0).all() and (ee > 0).all()
    assert (nn >= 0).all()
    # fMu damping: wall-adjacent nut well below core nut
    nut_grid = nn.reshape(30, 16)
    assert nut_grid[:, 0].mean() < 0.5 * nut_grid[:, 8].mean() + 1e-12
    assert float(diag["continuity"]) < 1e-3


def test_qzeta_channel():
    poly = _channel_poly(nx=30, ny=16)
    mesh = to_device(poly)
    k0 = 1.5 * 0.05 ** 2
    eps0 = 0.09 ** 0.75 * k0 ** 1.5 / 0.01
    U, p, k, eps, nut = _lowre_fields(mesh, k0, eps0)
    model = select(_props("qZeta"), NU)
    state, diag = _run_steady(mesh, U, p,
                              {"k": k, "epsilon": eps, "nut": nut}, model)
    kk = np.asarray(state["turb"]["k"].data)
    ee = np.asarray(state["turb"]["epsilon"].data)
    assert np.isfinite(kk).all() and (kk > 0).all() and (ee > 0).all()
    assert float(diag["continuity"]) < 1e-3


def test_v2f_channel():
    poly = _channel_poly(nx=30, ny=16)
    mesh = to_device(poly)
    k0 = 1.5 * 0.05 ** 2
    eps0 = 0.09 ** 0.75 * k0 ** 1.5 / 0.01
    v20 = (2.0 / 3.0) * k0

    def pface(patch, v):
        return jnp.broadcast_to(jnp.asarray(v), (patch.size,))

    U, p, k, eps, nut = _lowre_fields(mesh, k0, eps0)
    v2bcs, fbcs = [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            v2bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            fbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "inlet":
            v2bcs.append(pf.fixed_value(pface(patch, v20)))
            fbcs.append(pf.zero_gradient())
        elif patch.name == "outlet":
            v2bcs.append(pf.zero_gradient())
            fbcs.append(pf.zero_gradient())
        else:  # walls: v2 = 0, f = 0
            v2bcs.append(pf.fixed_value(pface(patch, 0.0)))
            fbcs.append(pf.fixed_value(pface(patch, 0.0)))
    v2 = vol_scalar(mesh, v20, name="v2", dims=DS.of(0, 2, -2),
                    bcs=tuple(v2bcs))
    f = vol_scalar(mesh, 0.0, name="f", dims=DS.of(0, 0, -1),
                   bcs=tuple(fbcs))
    model = select(_props("v2f"), NU)
    tstate = {"k": k, "epsilon": eps, "v2": v2, "f": f, "nut": nut}
    state, diag = _run_steady(mesh, U, p, tstate, model)
    kk = np.asarray(state["turb"]["k"].data)
    vv = np.asarray(state["turb"]["v2"].data)
    nn = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(kk).all() and np.isfinite(vv).all()
    assert (kk > 0).all() and (vv > 0).all() and (nn >= 0).all()
    # v2 < 2k (realizability-ish)
    assert (vv <= 2.0 * kk + 1e-10).all()
    assert float(diag["continuity"]) < 1e-3


def _rstm_fields(mesh, k0, eps0):
    """R with kqRWallFunction (zero-gradient) walls, eps wall fn."""
    def pface(patch, v, width=None):
        v = jnp.asarray(v)
        shape = (patch.size,) if width is None else (patch.size, width)
        return jnp.broadcast_to(v, shape)

    U, p, _ = channel_fields(mesh)  # wall-function style k/eps/nut bcs
    R0 = np.zeros(6, np.float64)
    R0[[0, 3, 5]] = (2.0 / 3.0) * k0
    Rbcs = []
    for patch in mesh.patches:
        if patch.type == "empty":
            Rbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "inlet":
            Rbcs.append(pf.fixed_value(pface(patch, jnp.asarray(R0), 6)))
        elif patch.name == "outlet":
            Rbcs.append(pf.zero_gradient())
        else:
            Rbcs.append(pf.make("kqRWallFunction"))
    R = vol_vector(mesh, jnp.broadcast_to(
        jnp.asarray(R0, np.asarray(mesh.v).dtype), (mesh.n_cells, 6)),
        name="R", dims=DS.of(0, 2, -2), bcs=tuple(Rbcs))
    return U, p, R


@pytest.mark.parametrize("model_name", ["LRR", "LaunderGibsonRSTM"])
def test_rstm_channel(model_name):
    poly = _channel_poly()
    mesh = to_device(poly)
    k0 = 1.5 * 0.05 ** 2
    eps0 = 0.09 ** 0.75 * k0 ** 1.5 / 0.01
    U, p, R = _rstm_fields(mesh, k0, eps0)
    _, _, tref = channel_fields(mesh)
    model = select(_props(model_name), NU)
    if hasattr(model, "init_wall_distance"):
        model.init_wall_distance(poly, np.asarray(mesh.v).dtype)
    tstate = {"R": R, "epsilon": tref["epsilon"], "k": tref["k"],
              "nut": tref["nut"]}
    state, diag = _run_steady(mesh, U, p, tstate, model, n=40)
    Rn = np.asarray(state["turb"]["R"].data)
    kk = np.asarray(state["turb"]["k"].data)
    nn = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(Rn).all()
    # positive normal stresses, k consistent with trace
    assert (Rn[:, [0, 3, 5]] > 0).all()
    np.testing.assert_allclose(kk, 0.5 * Rn[:, [0, 3, 5]].sum(1),
                               rtol=1e-5)
    assert (nn >= 0).all() and nn.max() > NU
    # shear stress Rxy should be negative where dU/dy > 0 (lower half)
    Rxy = Rn[:, 1].reshape(30, 10)
    assert Rxy[15:, :3].mean() < 0
    assert float(diag["continuity"]) < 1e-3


def test_sstsas_channel():
    poly = _channel_poly()
    mesh = to_device(poly)
    U, p, tstate = channel_fields(mesh, with_omega=True)
    model = select(_props("kOmegaSSTSAS"), NU)
    model.init_wall_distance(poly, np.asarray(mesh.v).dtype)
    cfg = piso.PisoConfig(
        nu=NU, n_correctors=2, div_scheme="limitedLinear 1",
        p_controls={"solver": "PCG", "tolerance": 1e-7, "relTol": 0.0},
        u_controls={"solver": "PBiCGStab", "tolerance": 1e-7, "relTol": 0.0},
        turb=model,
    )
    step = piso.make_step(mesh, cfg)
    state = piso.initial_state(mesh, U, p, turb_state=tstate)
    dt = jnp.asarray(0.02, mesh.v.dtype)
    for _ in range(25):
        state, diag = step(state, dt)
    k = np.asarray(state["turb"]["k"].data)
    om = np.asarray(state["turb"]["omega"].data)
    assert np.isfinite(k).all() and np.isfinite(om).all()
    assert (k > 0).all() and (om > 0).all()
    assert float(diag["continuity"]) < 1e-3


# ---------------------------------------------------------------------------
# LES family
# ---------------------------------------------------------------------------


def test_simple_filter_preserves_constants():
    from foamtpu.models.turbulence.les2 import simple_filter

    mesh = to_device(_channel_poly(nx=12, ny=8))
    c = jnp.full((mesh.n_cells,), 3.7, mesh.v.dtype)
    out = np.asarray(simple_filter(mesh, c))
    np.testing.assert_allclose(out, 3.7, rtol=1e-5)
    # vector variant
    v = jnp.stack([c, 2 * c, -c], axis=1)
    out_v = np.asarray(simple_filter(mesh, v))
    np.testing.assert_allclose(out_v[:, 1], 7.4, rtol=1e-5)


def _les_run(model_name, n=10, extra_k=False):
    mesh = to_device(_channel_poly())
    U, p, tstate0 = channel_fields(mesh)
    tstate = {"nut": tstate0["nut"]}
    if extra_k:
        tstate["k"] = tstate0["k"]
    props = FoamDict()
    props[Word("LESModel")] = Word(model_name)
    model = select(props, NU, kind="LES")
    cfg = piso.PisoConfig(
        nu=NU, n_correctors=2, div_scheme="limitedLinear 1",
        p_controls={"solver": "PCG", "tolerance": 1e-7, "relTol": 0.0},
        u_controls={"solver": "PBiCGStab", "tolerance": 1e-7, "relTol": 0.0},
        turb=model,
    )
    step = piso.make_step(mesh, cfg)
    state = piso.initial_state(mesh, U, p, turb_state=tstate)
    dt = jnp.asarray(0.02, mesh.v.dtype)
    for _ in range(n):
        state, diag = step(state, dt)
    return state, diag


@pytest.mark.parametrize("name,extra_k", [
    ("homogeneousDynSmagorinsky", False),
    ("dynOneEqEddy", True),
    ("scaleSimilarity", False),
    ("mixedSmagorinsky", False),
])
def test_les_models_channel(name, extra_k):
    state, diag = _les_run(name, extra_k=extra_k)
    u = np.asarray(state["U"].data)
    nut = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(u).all() and np.isfinite(nut).all()
    assert (nut >= 0).all()
    assert float(diag["continuity"]) < 1e-3
    assert np.abs(u).max() < 3.0
