"""Operator-layer validation: exactness on linear fields, conservation,
and a Laplace solve against the analytic solution."""

import numpy as np
import pytest

import jax.numpy as jnp

from foamtpu.bc import patchfields as pf
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import to_device
from foamtpu.ops import fvc, fvm
from foamtpu.solvers import linear

from test_blockmesh import cavity_mesh


@pytest.fixture(scope="module")
def mesh():
    return to_device(cavity_mesh(10))


def _scalar_field(mesh, data, bc_value=None):
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif bc_value is not None:
            bcs.append(pf.fixed_value(bc_value))
        else:
            bcs.append(pf.zero_gradient())
    f = vol_scalar(mesh, 0.0, bcs=tuple(bcs))
    return f.with_data(jnp.asarray(data, mesh.v.dtype))


def test_grad_linear_exact(mesh):
    # psi = 2x + 3y  ->  grad = (2, 3, 0); boundary fixedValue to exact
    c = np.asarray(mesh.c)
    data = 2 * c[:, 0] + 3 * c[:, 1]
    cf = np.asarray(mesh.cf)
    # fixedValue BCs with exact face values per patch
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            fv = 2 * cf[p.slice, 0] + 3 * cf[p.slice, 1]
            bcs.append(pf.fixed_value(jnp.asarray(fv, mesh.v.dtype)))
    f = vol_scalar(mesh, 0.0, bcs=tuple(bcs)).with_data(
        jnp.asarray(data, mesh.v.dtype)
    )
    g = fvc.grad(mesh, f)
    np.testing.assert_allclose(np.asarray(g[:, 0]), 2.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g[:, 1]), 3.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g[:, 2]), 0.0, atol=1e-5)


def test_div_of_constant_flux_zero(mesh):
    U = vol_vector(mesh, jnp.asarray([1.0, 2.0, 0.0]))
    phi = fvc.flux(mesh, U)
    d = fvc.div_surface(mesh, phi)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)


def test_conservation_surface_integrate(mesh):
    # sum over cells of V * surfaceIntegrate(anything) = boundary sum only
    rng = np.random.default_rng(0)
    face_vals = jnp.asarray(
        rng.standard_normal(mesh.n_faces), mesh.v.dtype
    )
    s = fvc.surface_integrate(mesh, face_vals)
    total = float(jnp.sum(s * mesh.v))
    bnd = float(jnp.sum(face_vals[mesh.n_internal_faces :]))
    np.testing.assert_allclose(total, bnd, rtol=1e-4)


def test_laplacian_solve_analytic(mesh):
    # solve laplacian(psi) = 0 with psi = x on left/right walls:
    # psi(x) = x is the exact solution on a uniform orthogonal mesh.
    cf = np.asarray(mesh.cf)
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs.append(pf.fixed_value(jnp.asarray(cf[p.slice, 0], mesh.v.dtype)))
    psi = vol_scalar(mesh, 0.0, bcs=tuple(bcs))
    mat = fvm.laplacian(mesh, 1.0, psi, corrected=False)
    new, perf = linear.solve(
        mesh, mat, psi.data, {"solver": "PCG", "tolerance": 1e-9, "relTol": 0.0}
    )
    c = np.asarray(mesh.c)
    np.testing.assert_allclose(np.asarray(new), c[:, 0], atol=1e-5)
    assert int(perf.n_iterations) > 0


def test_ddt_plus_laplacian_decay(mesh):
    # du/dt = laplacian(u): uniform field stays uniform
    u0 = vol_scalar(mesh, 1.0)
    rdt = jnp.asarray(1.0 / 0.01, mesh.v.dtype)
    from foamtpu.core.dimensions import dimViscosity

    mat = fvm.ddt(mesh, u0, u0.data, rdt) - fvm.laplacian(
        mesh, 1e-3, u0, corrected=False, gamma_dims=dimViscosity
    )
    new, perf = linear.solve(
        mesh, mat, u0.data, {"solver": "PCG", "tolerance": 1e-10, "relTol": 0.0}
    )
    np.testing.assert_allclose(np.asarray(new), 1.0, rtol=1e-5)


def test_convection_upwind_bounded(mesh):
    # steady convection of a scalar with uniform velocity: solution bounded
    U = vol_vector(mesh, jnp.asarray([1.0, 0.0, 0.0]))
    phi = fvc.flux(mesh, U)
    cf = np.asarray(mesh.cf)
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            # inlet value 1 on the left, zeroGradient elsewhere
            left = cf[p.slice, 0] < 1e-6
            bcs.append(
                pf.mixed(
                    ref_value=jnp.asarray(np.where(left, 1.0, 0.0), mesh.v.dtype),
                    ref_grad=0.0,
                    vfrac=jnp.asarray(np.where(left, 1.0, 0.0), mesh.v.dtype),
                )
            )
    T = vol_scalar(mesh, 0.0, bcs=tuple(bcs))
    nif = mesh.n_internal_faces
    w_up = jnp.where(phi[:nif] >= 0, 1.0, 0.0).astype(mesh.v.dtype)
    mat = fvm.div(mesh, phi, T, weights=w_up) + fvm.Sp(mesh, 1e-9, T)
    new, perf = linear.solve(
        mesh, mat, T.data,
        {"solver": "PBiCGStab", "tolerance": 1e-8, "relTol": 0.0},
    )
    arr = np.asarray(new)
    assert arr.min() > -1e-5 and arr.max() < 1 + 1e-5
    # pure advection from a uniform inlet -> T = 1 everywhere downstream
    np.testing.assert_allclose(arr, 1.0, atol=1e-4)


def test_vector_matrix_segregated(mesh):
    U = vol_vector(mesh, jnp.asarray([0.0, 0.0, 0.0]))
    cf = np.asarray(mesh.cf)
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            vals = np.stack(
                [cf[p.slice, 0], 2 * cf[p.slice, 1], np.zeros(p.size)], axis=1
            )
            bcs.append(pf.fixed_value(jnp.asarray(vals, mesh.v.dtype)))
    U = U.replace(bcs=tuple(bcs))
    mat = fvm.laplacian(mesh, 1.0, U, corrected=False)
    new, perf = linear.solve(
        mesh, mat, U.data, {"solver": "PCG", "tolerance": 1e-9, "relTol": 0.0}
    )
    c = np.asarray(mesh.c)
    np.testing.assert_allclose(np.asarray(new[:, 0]), c[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new[:, 1]), 2 * c[:, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new[:, 2]), 0.0, atol=1e-6)
