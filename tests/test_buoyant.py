"""buoyantBoussinesq{Simple,Pimple}Foam (reference:
applications/solvers/heatTransfer/buoyantBoussinesq*Foam/)."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import buoyant

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RB_BLOCKMESH = """
convertToMeters 1;
vertices
(
    (0 0 0) (4 0 0) (4 1 0) (0 1 0)
    (0 0 0.1) (4 0 0.1) (4 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (32 8 1) simpleGrading (1 1 1) );
boundary
(
    floor   { type wall; faces ((1 5 4 0)); }
    ceiling { type wall; faces ((3 7 6 2)); }
    sides   { type cyclic; neighbourPatch sides2; faces ((0 4 7 3)); }
    sides2  { type cyclic; neighbourPatch sides;  faces ((2 6 5 1)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _rb_setup(dT):
    """Periodic Rayleigh-Benard slab heated from below by dT."""
    mesh = to_device(blockmesh.generate(parse_string(RB_BLOCKMESH)))
    ubcs, pbcs, tbcs = [], [], []
    for p in mesh.patches:
        if p.type == "empty":
            for lst in (ubcs, pbcs, tbcs):
                lst.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.name == "floor":
            ubcs.append(pf.fixed_value(jnp.zeros(3)))
            pbcs.append(pf.zero_gradient())
            tbcs.append(pf.fixed_value(300.0 + dT))
        elif p.name == "ceiling":
            ubcs.append(pf.fixed_value(jnp.zeros(3)))
            pbcs.append(pf.zero_gradient())
            tbcs.append(pf.fixed_value(300.0))
        else:
            ubcs.append(pf.zero_gradient())
            pbcs.append(pf.zero_gradient())
            tbcs.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(ubcs))
    p_rgh = vol_scalar(mesh, 0.0, name="p_rgh",
                       dims=DimensionSet.of(0, 2, -2), bcs=tuple(pbcs))
    # seed a tiny perturbation so the instability has something to amplify
    rng = np.random.default_rng(0)
    T0 = 300.0 + dT * (1.0 - np.asarray(mesh.c)[:, 1])
    T0 = T0 + 1e-3 * dT * rng.standard_normal(mesh.n_cells)
    T = vol_scalar(mesh, 0.0, name="T", dims=DimensionSet.of(0, 0, 0, 1),
                   bcs=tuple(tbcs)).with_data(
        jnp.asarray(T0, mesh.v.dtype))
    return mesh, U, p_rgh, T


def _run_rb(dT, nu, n=60):
    mesh, U, p_rgh, T = _rb_setup(dT)
    cfg = buoyant.BoussinesqConfig(
        nu=nu, beta=3.3e-3, t_ref=300.0, pr=1.0, g=(0.0, -9.81, 0.0),
        steady=False, n_outer=1, n_correctors=2, div_scheme="linear",
        div_scheme_t="upwind", alpha_u=1.0, alpha_p=1.0, alpha_t=1.0)
    state = buoyant.initial_state(mesh, U, p_rgh, T, steady=False)
    step = jax.jit(lambda s, d: buoyant.boussinesq_step(mesh, s, d, cfg))
    dt = jnp.asarray(0.25, mesh.v.dtype)
    for _ in range(n):
        state, diag = step(state, dt)
    assert np.isfinite(np.asarray(state["U"].data)).all()
    return float(jnp.max(jnp.abs(state["U"].data[:, 1]))), diag


def test_rayleigh_benard_onset():
    """Convective onset: Ra >> Ra_c grows a convective roll; the
    stably-stratified configuration (heated from ABOVE) stays quiescent.
    Ra = g beta dT H^3/(nu kappa); with H=1, dT=10, nu=kappa=1e-3:
    Ra ~ 3.2e5 >> 1708."""
    v_unstable, diag = _run_rb(dT=10.0, nu=1e-3)
    v_stable, _ = _run_rb(dT=-10.0, nu=1e-3)
    assert v_unstable > 50.0 * max(v_stable, 1e-12)
    assert v_unstable > 1e-3  # a real convective velocity developed
    assert float(diag["continuity"]) < 1e-4


def test_hotroom_tutorial_runs(tmp_path):
    """hotRoom tutorial (reference: tutorials/heatTransfer/
    buoyantBoussinesqSimpleFoam/hotRoom) through the full CLI path."""
    src = os.path.join(REPO, "tutorials", "heatTransfer",
                       "buoyantBoussinesqSimpleFoam", "hotRoom")
    dst = str(tmp_path / "hotRoom")
    shutil.copytree(src, dst)
    from foamtpu.apps.cli import main as cli_main

    assert cli_main(["blockMesh", "-case", dst]) == 0
    assert cli_main(["run", "-case", dst, "-steps", "200"]) == 0
    from foamtpu.core.case import Case

    case = Case(dst)
    times = sorted((d for d in os.listdir(dst)
                    if d.replace(".", "").isdigit() and float(d) > 0),
                   key=float)
    assert times, "no time directory written"
    U = case.read_field("U", time=times[-1])
    T = case.read_field("T", time=times[-1])
    Udata = np.asarray(U.data)
    Tdata = np.asarray(T.data)
    assert np.isfinite(Udata).all() and np.isfinite(Tdata).all()
    # buoyant plume off the heated floor; T near the BC bounds (small
    # transient over/undershoot of the upwind SIMPLE iteration allowed)
    assert float(Udata[:, 1].max()) > 0.1
    assert 295.0 <= Tdata.min() <= Tdata.max() <= 312.0
