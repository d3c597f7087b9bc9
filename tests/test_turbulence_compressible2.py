"""Compressible turbulence tree part 2
(models/turbulence/compressible2.py; reference:
src/turbulenceModels/compressible/{RAS,LES}/ — the twins VERDICT r4
missing #4 listed as still-aliased).

Oracle: on a constant-rho solenoidal case every compressible twin must
agree with its incompressible counterpart to roundoff (the rho-weighted
conservative form reduces exactly); on a variable-rho case it must
diverge. lowReOneEqEddy (compressible-only in the reference) is
checked against its own published asymptotics instead."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import FoamDict, Word
from foamtpu.core.dimensions import DimensionSet as DS, dimViscosity
from foamtpu.core.fields import VolField, vol_scalar
from foamtpu.models.turbulence import select
from foamtpu.ops import surface
from foamtpu.solvers import piso

from test_turbulence import NU, channel_fields, channel_mesh
from test_turbulence_compressible import _poly

MU = NU


def _props(model, les=False):
    d = FoamDict()
    d[Word("LESModel" if les else "RASModel")] = Word(model)
    d[Word("turbulence")] = Word("on")
    return d


def _base(mesh):
    U, p, tstate = channel_fields(mesh)
    state = piso.initial_state(mesh, U, p, turb_state=tstate)
    phi = state["phi"]
    mut = dataclasses.replace(tstate["nut"], name="mut")
    return U, phi, tstate, mut


def _pface(patch, v, width=None):
    v = jnp.asarray(v)
    shape = (patch.size,) if width is None else (patch.size, width)
    return jnp.broadcast_to(v, shape)


def _nuTilda(mesh, val=1e-3):
    bcs = []
    for patch in mesh.patches:
        if patch.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "inlet":
            bcs.append(pf.fixed_value(_pface(patch, val)))
        elif patch.name == "outlet":
            bcs.append(pf.zero_gradient())
        else:
            bcs.append(pf.fixed_value(_pface(patch, 0.0)))
    return vol_scalar(mesh, val, name="nuTilda", dims=dimViscosity,
                      bcs=tuple(bcs))


def _symm6(mesh, k_f, name):
    k0 = k_f.data
    B0 = jnp.stack([2.0 / 3.0 * k0, 0 * k0, 0 * k0,
                    2.0 / 3.0 * k0, 0 * k0, 2.0 / 3.0 * k0], axis=1)
    bcs = []
    for patch in mesh.patches:
        if patch.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs.append(pf.zero_gradient())
    return VolField(data=B0, name=name, dims=DS.of(0, 2, -2),
                    bcs=tuple(bcs))


def _v2f_fields(mesh, k0):
    v20 = (2.0 / 3.0) * k0
    v2bcs, fbcs = [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            v2bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            fbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "inlet":
            v2bcs.append(pf.fixed_value(_pface(patch, v20)))
            fbcs.append(pf.zero_gradient())
        elif patch.name == "outlet":
            v2bcs.append(pf.zero_gradient())
            fbcs.append(pf.zero_gradient())
        else:
            v2bcs.append(pf.fixed_value(_pface(patch, 0.0)))
            fbcs.append(pf.fixed_value(_pface(patch, 0.0)))
    v2 = vol_scalar(mesh, v20, name="v2", dims=DS.of(0, 2, -2),
                    bcs=tuple(v2bcs))
    f = vol_scalar(mesh, 0.0, name="f", dims=DS.of(0, 0, -1),
                   bcs=tuple(fbcs))
    return v2, f


def _states_for(mesh, name, tstate, mut):
    """(incompressible tstate, compressible tstate) for model `name`."""
    k_f = tstate["k"]
    if name in ("RNGkEpsilon", "realizableKE"):
        ti = {"k": k_f, "epsilon": tstate["epsilon"], "nut": tstate["nut"]}
        tc = {"k": k_f, "epsilon": tstate["epsilon"], "mut": mut}
        fields = ("k", "epsilon")
    elif name == "SpalartAllmaras":
        nuT = _nuTilda(mesh)
        ti = {"nuTilda": nuT, "nut": tstate["nut"]}
        tc = {"nuTilda": nuT, "mut": mut}
        fields = ("nuTilda",)
    elif name in ("LRR", "LaunderGibsonRSTM"):
        R = _symm6(mesh, k_f, "R")
        ti = {"R": R, "epsilon": tstate["epsilon"], "k": k_f,
              "nut": tstate["nut"]}
        tc = {"R": R, "epsilon": tstate["epsilon"], "k": k_f, "mut": mut}
        fields = ("R", "epsilon", "k")
    elif name == "v2f":
        v2, f = _v2f_fields(mesh, float(k_f.data[0]))
        ti = {"k": k_f, "epsilon": tstate["epsilon"], "v2": v2, "f": f,
              "nut": tstate["nut"]}
        tc = {"k": k_f, "epsilon": tstate["epsilon"], "v2": v2, "f": f,
              "mut": mut}
        fields = ("k", "epsilon", "v2", "f")
    elif name == "dynOneEqEddy":
        ti = {"k": k_f, "nut": tstate["nut"]}
        tc = {"k": k_f, "mut": mut}
        fields = ("k",)
    elif name == "DeardorffDiffStress":
        B = _symm6(mesh, k_f, "B")
        ti = {"B": B, "k": k_f, "nut": tstate["nut"]}
        tc = {"B": B, "k": k_f, "mut": mut}
        fields = ("B", "k")
    else:
        raise ValueError(name)
    return ti, tc, fields


RAS_TWINS = ["RNGkEpsilon", "realizableKE", "SpalartAllmaras", "LRR",
             "LaunderGibsonRSTM", "v2f"]
LES_TWINS = ["dynOneEqEddy", "DeardorffDiffStress"]


@pytest.mark.parametrize("name", RAS_TWINS + LES_TWINS)
def test_constant_rho_parity(name):
    """rho = 1, solenoidal mass flux: the conservative form reduces
    exactly to the incompressible twin (exact in f32 arithmetic for
    every transported field and for mut == nut)."""
    les = name in LES_TWINS
    mesh = channel_mesh()
    U, phi, tstate, mut = _base(mesh)
    dt = jnp.asarray(0.01, mesh.v.dtype)
    rho = jnp.ones(mesh.n_cells, mesh.v.dtype)

    inc = select(_props(name, les), NU, kind="LES" if les else "RAS")
    comp = select(_props(name, les), MU, kind="LES" if les else "RAS",
                  compressible=True)
    assert comp.name == f"compressible::{name}"
    assert getattr(comp, "compressible_form", False)
    if hasattr(inc, "init_wall_distance"):
        poly = _poly(mesh)
        for m in (inc, comp):
            m.init_wall_distance(poly, np.asarray(mesh.v).dtype)

    ti, tc, fields = _states_for(mesh, name, tstate, mut)
    new_i, _ = inc.correct(mesh, ti, U, phi, dt)
    new_c, _ = comp.correct_rho(mesh, tc, U, phi, rho, dt)
    # the dynamic-coefficient LES twins recompute Ck through a long
    # filter/contraction chain whose f32 rounding differs between the
    # mu- and nu-form code paths; everything else matches tighter
    rtol = 1e-3 if les else 2e-4
    for f in fields:
        a = np.asarray(new_c[f].data)
        b = np.asarray(new_i[f].data)
        assert np.isfinite(a).all(), f"{name}.{f} not finite"
        np.testing.assert_allclose(a, b, rtol=rtol, atol=1e-10,
                                   err_msg=f"{name}.{f}")
    np.testing.assert_allclose(np.asarray(new_c["mut"].data),
                               np.asarray(new_i["nut"].data),
                               rtol=rtol, atol=1e-12,
                               err_msg=f"{name}.mut")


@pytest.mark.parametrize("name", ["RNGkEpsilon", "SpalartAllmaras",
                                  "LRR"])
def test_variable_rho_diverges(name):
    """rho varying 2:1 across the channel: the rho-weighted equations
    must differ from the incompressible alias run on volumetric flux."""
    mesh = channel_mesh()
    U, phi, tstate, mut = _base(mesh)
    dt = jnp.asarray(0.01, mesh.v.dtype)
    c = np.asarray(mesh.c)
    rho = jnp.asarray(1.0 + (c[:, 1] / 0.1), mesh.v.dtype)
    rho_b = surface.owner_to_b(mesh, rho)
    from foamtpu.ops import slot as slot_mod

    rho_slot = slot_mod.interpolate(mesh, rho, bv=rho_b)
    phi_sl = slot_mod.from_flat(mesh, phi)
    phi_mass = slot_mod.to_flat(mesh, slot_mod.SlotFace(
        phi_sl.sv * rho_slot.sv, phi_sl.fb * rho_slot.fb,
        phi_sl.bv * rho_slot.bv))

    inc = select(_props(name), NU)
    comp = select(_props(name), MU, compressible=True)
    if hasattr(inc, "init_wall_distance"):
        poly = _poly(mesh)
        for m in (inc, comp):
            m.init_wall_distance(poly, np.asarray(mesh.v).dtype)
    ti, tc, fields = _states_for(mesh, name, tstate, mut)
    new_i, _ = inc.correct(mesh, ti, U, phi, dt)
    new_c, _ = comp.correct_rho(mesh, tc, U, phi_mass, rho, dt)
    f = fields[0]
    a = np.asarray(new_c[f].data)
    b = np.asarray(new_i[f].data)
    assert np.isfinite(a).all()
    rel = np.max(np.abs(a - b)) / np.max(np.abs(b))
    assert rel > 1e-3, f"{name}: rho-weighting changed nothing ({rel})"
    m = np.asarray(new_c["mut"].data)
    assert (m >= 0).all() and np.isfinite(m).all()


def test_low_re_one_eq_eddy():
    """compressible::lowReOneEqEddy (compressible-only in the
    reference): muSgs = high-Re muSgs minus the molecular-damping term,
    so (a) muSgs <= high-Re muSgs everywhere, (b) muSgs >= 0, and
    (c) as mu -> 0 the damping vanishes and it matches oneEqEddy."""
    mesh = channel_mesh()
    U, phi, tstate, mut = _base(mesh)
    dt = jnp.asarray(0.005, mesh.v.dtype)
    rho = jnp.full(mesh.n_cells, 1.2, mesh.v.dtype)

    hi = select(_props("oneEqEddy", les=True), MU, kind="LES",
                compressible=True)
    lo = select(_props("lowReOneEqEddy", les=True), MU, kind="LES",
                compressible=True)
    assert lo.name == "compressible::lowReOneEqEddy"
    tc = {"k": tstate["k"], "mut": mut}
    new_hi, _ = hi.correct_rho(mesh, dict(tc), U, phi, rho, dt)
    new_lo, _ = lo.correct_rho(mesh, dict(tc), U, phi, rho, dt)
    m_hi = np.asarray(new_hi["mut"].data)
    m_lo = np.asarray(new_lo["mut"].data)
    assert np.isfinite(m_lo).all() and (m_lo >= 0).all()
    assert (m_lo <= m_hi + 1e-12).all()

    lo2 = select(_props("lowReOneEqEddy", les=True), 1e-12, kind="LES",
                 compressible=True)
    new_lo2, _ = lo2.correct_rho(mesh, dict(tc), U, phi, rho, dt)
    hi2 = select(_props("oneEqEddy", les=True), 1e-12, kind="LES",
                 compressible=True)
    new_hi2, _ = hi2.correct_rho(mesh, dict(tc), U, phi, rho, dt)
    np.testing.assert_allclose(np.asarray(new_lo2["mut"].data),
                               np.asarray(new_hi2["mut"].data),
                               rtol=1e-3, atol=1e-12)


def test_registry_covers_reference_compressible_menu():
    """The compressible:: registry covers the reference RAS+LES lists
    (src/turbulenceModels/compressible/{RAS,LES}/Make/files)."""
    from foamtpu.models.turbulence import base as tb

    select(_props("kEpsilon"), MU, compressible=True)  # force imports
    ras = ["kEpsilon", "RNGkEpsilon", "realizableKE", "LaunderSharmaKE",
           "kOmegaSST", "SpalartAllmaras", "LRR", "LaunderGibsonRSTM"]
    les = ["Smagorinsky", "oneEqEddy", "dynOneEqEddy", "lowReOneEqEddy",
           "DeardorffDiffStress"]
    missing = [n for n in ras + les
               if f"compressible::{n}" not in tb._REGISTRY]
    assert not missing, f"missing compressible twins: {missing}"
