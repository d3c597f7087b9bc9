"""Explicit ppermute-halo production path (VERDICT r4 next #10):
FOAMTPU_HALO=explicit swaps the Krylov fine-level SpMV for the
shard_map halo kernel (parallel/comm.py::halo_apply_off), armed by
gspmd.shard_case. Oracle: equal results to the default GSPMD path on
the 8-virtual-device mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.apps.cases import make_cavity
from foamtpu.parallel import comm, gspmd
from foamtpu.solvers import piso

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _run_sharded(n_steps=3):
    p_solver = {"solver": "PCG", "preconditioner": "polynomial",
                "tolerance": 1e-7, "relTol": 0.0, "maxIter": 2000}
    mesh, state, cfg = make_cavity(32, p_solver=dict(p_solver))
    jmesh = gspmd.space_mesh(8)
    mesh_s, state_s = gspmd.shard_case(mesh, state, jmesh)
    dt = jnp.asarray(0.005, mesh.v.dtype)
    step = jax.jit(lambda s, d: piso.piso_step(mesh_s, s, d, cfg))
    diag = None
    for _ in range(n_steps):
        state_s, diag = step(state_s, dt)
    jax.block_until_ready(state_s["U"].data)
    return state_s, diag


def test_halo_apply_off_matches_roll():
    """Kernel-level: halo_apply_off == StencilOp.apply_off on the
    sharded cavity pressure stencil (scalar and multi-RHS)."""
    from foamtpu.ops import stencil as stencil_mod

    mesh, state, cfg = make_cavity(32)
    jmesh = gspmd.space_mesh(8)
    rng = np.random.default_rng(0)
    off = jnp.asarray(rng.standard_normal(
        (mesh.n_cells, len(mesh.st_deltas))), mesh.v.dtype)
    # mask exactly like a slot matrix does
    off = off * mesh.st_valid
    st = stencil_mod.StencilOp(tuple(mesh.st_deltas), off,
                               mesh.fb_cells, mesh.fb_nbrs,
                               jnp.zeros((0,), mesh.v.dtype))
    x1 = jnp.asarray(rng.standard_normal(mesh.n_cells), mesh.v.dtype)
    ref = np.asarray(st.apply_off(x1))
    got = np.asarray(comm.halo_apply_off(jmesh, st.deltas, off, x1))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    xv = jnp.asarray(rng.standard_normal((mesh.n_cells, 3)),
                     mesh.v.dtype)
    refv = np.asarray(st.apply_off(xv))
    gotv = np.asarray(comm.halo_apply_off(jmesh, st.deltas, off, xv))
    np.testing.assert_allclose(gotv, refv, rtol=1e-6, atol=1e-7)


def test_explicit_halo_equals_gspmd():
    """Flag on vs off: the sharded PISO run (PCG pressure — the Krylov
    path the hook covers) produces identical fields."""
    old = os.environ.get("FOAMTPU_HALO")
    try:
        os.environ.pop("FOAMTPU_HALO", None)
        gspmd._HALO_JMESH = None
        ref_state, ref_diag = _run_sharded()

        os.environ["FOAMTPU_HALO"] = "explicit"
        sh_state, sh_diag = _run_sharded()
        assert gspmd.active_halo_mesh()[0] is not None, \
            "flag did not arm the halo path"
    finally:
        gspmd._HALO_JMESH = None
        if old is None:
            os.environ.pop("FOAMTPU_HALO", None)
        else:
            os.environ["FOAMTPU_HALO"] = old

    du = np.max(np.abs(np.asarray(ref_state["U"].data)
                       - np.asarray(sh_state["U"].data)))
    dp = np.max(np.abs(np.asarray(ref_state["p"].data)
                       - np.asarray(sh_state["p"].data)))
    # same arithmetic, different collective placement: tiny f32
    # reassociation noise at most
    assert du < 1e-5, f"explicit halo deviates: |dU|={du}"
    assert dp < 1e-4, f"explicit halo deviates: |dp|={dp}"
    assert float(sh_diag["continuity"]) < 1e-4
