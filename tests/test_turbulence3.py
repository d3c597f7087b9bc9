"""Turbulence additions: the Shih quadratic nonlinear k-epsilon
(NonlinearKEShih) and the Lagrangian-averaged dynamic Smagorinsky
(dynLagrangian). Oracles: positivity/boundedness, anisotropy of the
nonlinear stress in pure shear, and agreement with the linear model in
the weak-strain limit."""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.dimensions import DimensionSet as DS
from foamtpu.core.dimensions import dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import to_device
from foamtpu.models.turbulence import select

from test_turbulence import NU, _props
from test_turbulence2 import (_channel_poly, _lowre_fields,
                              _run_steady)


def test_nonlinear_ke_shih_channel():
    """Channel run: stays bounded, produces positive nut, and the
    nonlinear stress is a traceless symmetric tensor that is nonzero
    in the sheared wall region."""
    poly = _channel_poly(nx=30, ny=16)
    mesh = to_device(poly)
    k0 = 1.5 * 0.05 ** 2
    eps0 = 0.09 ** 0.75 * k0 ** 1.5 / 0.01
    U, p, k, eps, nut = _lowre_fields(mesh, k0, eps0)
    model = select(_props("NonlinearKEShih"), NU)
    state, diag = _run_steady(mesh, U, p,
                              {"k": k, "epsilon": eps, "nut": nut},
                              model, n=80)
    kk = np.asarray(state["turb"]["k"].data)
    ee = np.asarray(state["turb"]["epsilon"].data)
    nn = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(kk).all() and (kk > 0).all() and (ee > 0).all()
    assert (nn >= 0).all() and nn.max() > 0
    # nonlinear source slows SIMPLE convergence slightly vs kEpsilon
    assert float(diag["continuity"]) < 3e-3

    nls, g = model.nonlinear_stress(mesh, state["U"],
                                    state["turb"]["k"].data,
                                    state["turb"]["epsilon"].data)
    nls = np.asarray(nls)
    # symmetric and (near-)deviatoric normal-stress anisotropy exists
    np.testing.assert_allclose(nls, np.transpose(nls, (0, 2, 1)),
                               atol=1e-12)
    aniso = np.abs(nls[:, 0, 0] - nls[:, 1, 1]).max()
    assert aniso > 0.0


def test_nonlinear_stress_vanishes_at_zero_strain():
    poly = _channel_poly(nx=8, ny=4)
    mesh = to_device(poly)
    model = select(_props("NonlinearKEShih"), NU)
    bcs = tuple(pf.PatchField(kind="empty", vfrac=0.0)
                if p_.type == "empty" else pf.zero_gradient()
                for p_ in mesh.patches)
    U = vol_vector(mesh, (0.0, 0.0, 0.0), name="U", dims=dimVelocity,
                   bcs=bcs)
    k = jnp.full(mesh.n_cells, 1e-3)
    eps = jnp.full(mesh.n_cells, 1e-3)
    nls, _ = model.nonlinear_stress(mesh, U, k, eps)
    assert float(jnp.abs(nls).max()) == 0.0


def test_variable_cmu_reduces_under_strain():
    """Shih's Cmu = (2/3)/(A1 + eta + alphaKsi ksi) decreases with the
    strain invariant — the realizability property of the closure."""
    model = select(_props("NonlinearKEShih"), NU)
    c_low = model._cmu_var(jnp.asarray(0.0), jnp.asarray(0.0))
    c_hi = model._cmu_var(jnp.asarray(10.0), jnp.asarray(5.0))
    assert float(c_low) > float(c_hi)
    assert abs(float(c_low) - 2.0 / 3.0 / 1.25) < 1e-6  # f32


def test_dyn_lagrangian_channel():
    """dynLagrangian on the channel: flm/fmm stay positive, the
    pathline-averaged coefficient is bounded, nut >= 0 and finite."""
    poly = _channel_poly(nx=30, ny=10)
    mesh = to_device(poly)
    from test_turbulence import channel_fields

    U, p, _ = channel_fields(mesh)
    from foamtpu.core.dictionary import FoamDict, Word

    props = FoamDict()
    props[Word("LESModel")] = Word("dynLagrangian")
    props[Word("turbulence")] = Word("on")
    model = select(props, NU, kind="LES")
    tstate = model.init_state(mesh)
    # nut needs boundary handling: calculated everywhere
    nutbcs = tuple(pf.PatchField(kind="empty", vfrac=0.0)
                   if p_.type == "empty" else
                   pf.make("calculated",
                           ref_value=jnp.zeros(p_.size))
                   for p_ in mesh.patches)
    tstate["nut"] = vol_scalar(mesh, 0.0, name="nut",
                               dims=DS.of(0, 2, -1), bcs=nutbcs)
    state, diag = _run_steady(mesh, U, p, tstate, model, n=30)
    flm = np.asarray(state["turb"]["flm"].data)
    fmm = np.asarray(state["turb"]["fmm"].data)
    nn = np.asarray(state["turb"]["nut"].data)
    assert np.isfinite(flm).all() and np.isfinite(fmm).all()
    assert (flm >= 0).all() and (fmm > 0).all()
    assert (nn >= 0).all() and np.isfinite(nn).all()
    cD = flm / fmm
    assert cD.max() <= 0.5 + 1e-6
    assert float(diag["continuity"]) < 1e-3
