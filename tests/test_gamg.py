import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.fields import vol_scalar
from foamtpu.mesh import to_device
from foamtpu.ops import fvm
from foamtpu.solvers.linear.gamg import GAMG, hierarchy_for_mesh

from test_blockmesh import cavity_mesh


@pytest.fixture(scope="module")
def mesh40():
    return to_device(cavity_mesh(40))


def test_hierarchy_structure(mesh40):
    # deep hierarchy (the production default truncates at 1024 cells
    # for latency — see build_hierarchy; structure checked here with
    # the fully-coarsened ladder)
    levels = hierarchy_for_mesh(mesh40, n_coarsest=32)
    assert len(levels) >= 3
    sizes = [mesh40.n_cells] + [lv.n_coarse for lv in levels]
    # pairwise (2x) coarsening with padding
    for lv in levels:
        assert lv.n_coarse == lv.n_fine_pad // 2
        assert lv.n_fine_pad >= lv.n_fine
    assert sizes[-1] <= 64
    # every padded fine cell belongs to exactly one coarse pair
    lv = levels[0]
    members = np.asarray(lv.members_pad)
    flat = np.sort(members.ravel())
    np.testing.assert_array_equal(flat, np.arange(lv.n_fine_pad))
    # coarse levels stay structured: stencil covers everything (no fallback)
    for lv in levels:
        assert lv.st["fb_cells"].shape[0] == 0


@pytest.mark.slow
def test_gamg_poisson(mesh40):
    cf = np.asarray(mesh40.cf)
    bcs = []
    for p in mesh40.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs.append(pf.fixed_value(jnp.asarray(cf[p.slice, 0], mesh40.v.dtype)))
    psi = vol_scalar(mesh40, 0.0, bcs=tuple(bcs))
    mat = fvm.laplacian(mesh40, 1.0, psi, corrected=False)
    g = GAMG(mesh40)
    new, perf = g.solve(mesh40, mat, psi.data,
                        {"tolerance": 1e-7, "relTol": 0.0, "maxIter": 50})
    c = np.asarray(mesh40.c)
    np.testing.assert_allclose(np.asarray(new), c[:, 0], atol=2e-5)
    # multigrid efficiency: a handful of cycles, not hundreds
    assert int(perf.n_iterations) <= 16


def test_gamg_beats_pcg_iterations(mesh40):
    """GAMG converges in O(1) cycles where diagonal-PCG needs O(N)."""
    from foamtpu.solvers import linear

    psi = vol_scalar(mesh40, 0.0)
    # Poisson with random source, zeroGradient everywhere -> singular;
    # pin reference cell
    rng = np.random.default_rng(1)
    src = rng.standard_normal(mesh40.n_cells)
    src -= src.mean()
    mat = fvm.laplacian(mesh40, 1.0, psi, corrected=False)
    mat = mat.replace_fields(
        source=jnp.asarray(src * np.asarray(mesh40.v), mesh40.v.dtype)
    )
    mat = mat.set_reference(0, 0.0)

    g = GAMG(mesh40)
    x_g, perf_g = g.solve(mesh40, mat, psi.data,
                          {"tolerance": 1e-6, "relTol": 0.0, "maxIter": 100})
    x_p, perf_p = linear.solve(
        mesh40, mat, psi.data,
        {"solver": "PCG", "tolerance": 1e-6, "relTol": 0.0, "maxIter": 2000},
    )
    assert int(perf_g.n_iterations) < int(perf_p.n_iterations) / 4
    # same solution
    np.testing.assert_allclose(
        np.asarray(x_g), np.asarray(x_p), atol=5e-3 * float(jnp.abs(x_p).max())
    )


def test_gamg_asymmetric_convection_diffusion(mesh40):
    """GAMG on a convection-bearing (asymmetric) matrix must agree with
    BiCGStab — regression for the r1 upper/lower transpose bug where
    every coarse level was built from A^T (ADVICE.md r1 #1)."""
    from foamtpu.ops import fvc
    from foamtpu.solvers import linear

    cf = np.asarray(mesh40.cf)
    bcs = []
    for p in mesh40.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs.append(pf.fixed_value(
                jnp.asarray(cf[p.slice, 0], mesh40.v.dtype)))
    psi = vol_scalar(mesh40, 0.0, bcs=tuple(bcs))
    # a swirling flux field -> strongly asymmetric convection matrix
    from foamtpu.core.fields import vol_vector
    from foamtpu.core.dimensions import dimVelocity

    c = np.asarray(mesh40.c)
    Uc = np.stack([-(c[:, 1] - 0.05), c[:, 0] - 0.05,
                   np.zeros(mesh40.n_cells)], axis=1) * 20.0
    U = vol_vector(mesh40, jnp.zeros(3), dims=dimVelocity).with_data(
        jnp.asarray(Uc, mesh40.v.dtype))
    from foamtpu.core.dimensions import dimViscosity

    phi = fvc.flux(mesh40, U)
    mat = fvm.div(mesh40, phi, psi) - fvm.laplacian(
        mesh40, 0.05, psi, corrected=False, gamma_dims=dimViscosity)
    assert not mat.symmetric

    g = GAMG(mesh40)
    x_g, perf_g = g.solve(mesh40, mat, psi.data,
                          {"tolerance": 1e-8, "relTol": 0.0, "maxIter": 100})
    x_b, _ = linear.solve(
        mesh40, mat, psi.data,
        {"solver": "PBiCGStab", "tolerance": 1e-10, "relTol": 0.0,
         "maxIter": 4000},
    )
    scale = float(jnp.abs(x_b).max())
    np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_b),
                               atol=1e-4 * scale)
    assert int(perf_g.n_iterations) <= 60
