"""ddt scheme (backward/CrankNicolson) and grad scheme
(leastSquares/cellLimited) tests + fvSchemes keyword dispatch."""

import numpy as np
import jax.numpy as jnp
import pytest

from foamtpu.bc import patchfields as pf
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.core.dimensions import dimVelocity
from foamtpu.mesh import to_device
from foamtpu.ops import fvc, fvm
from foamtpu.solvers import linear

from test_blockmesh import cavity_mesh


@pytest.fixture(scope="module")
def mesh16():
    return to_device(cavity_mesh(16))


def _linear_scalar(mesh, a=(2.0, -3.0, 0.0), b=0.5):
    c = np.asarray(mesh.c)
    vals = c @ np.asarray(a) + b
    cf = np.asarray(mesh.cf)
    bcs = []
    for p in mesh.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bvals = cf[p.slice] @ np.asarray(a) + b
            bcs.append(pf.fixed_value(jnp.asarray(bvals, mesh.v.dtype)))
    f = vol_scalar(mesh, 0.0, bcs=tuple(bcs))
    return f.with_data(jnp.asarray(vals, mesh.v.dtype))


def test_least_squares_grad_exact_linear(mesh16):
    f = _linear_scalar(mesh16)
    g = fvc.grad_least_squares(mesh16, f)
    g = np.asarray(g)
    np.testing.assert_allclose(g[:, 0], 2.0, atol=1e-4)
    np.testing.assert_allclose(g[:, 1], -3.0, atol=1e-4)
    np.testing.assert_allclose(g[:, 2], 0.0, atol=1e-4)


def test_least_squares_grad_vector(mesh16):
    c = np.asarray(mesh16.c)
    cf = np.asarray(mesh16.cf)
    A = np.array([[1.0, 2.0, 0.0], [4.0, -1.0, 0.0], [0.0, 0.0, 0.0]])
    vals = c @ A
    bcs = []
    for p in mesh16.patches:
        if p.type == "empty":
            bcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bcs.append(pf.fixed_value(
                jnp.asarray(cf[p.slice] @ A, mesh16.v.dtype)))
    U = vol_vector(mesh16, jnp.zeros(3), dims=dimVelocity,
                   bcs=tuple(bcs)).with_data(jnp.asarray(vals, mesh16.v.dtype))
    g = np.asarray(fvc.grad_least_squares(mesh16, U))  # g[c,i,j]=d_i u_j
    for i in range(3):
        for j in range(3):
            np.testing.assert_allclose(g[:, i, j], A[i, j], atol=2e-4,
                                       err_msg=f"component ({i},{j})")


def test_cell_limited_grad(mesh16):
    # smooth linear field: limiter must be inactive (gradient unchanged)
    f = _linear_scalar(mesh16)
    g0 = fvc.grad(mesh16, f)
    gl = fvc.grad_cell_limited(mesh16, f, g0, 1.0)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(g0),
                               rtol=1e-5, atol=1e-6)

    # step field: extrapolations of the limited gradient stay within
    # the neighbour extrema (the defining property)
    c = np.asarray(mesh16.c)
    step_vals = (c[:, 0] > 0.05).astype(np.asarray(mesh16.v).dtype)
    fs = vol_scalar(mesh16, 0.0, bcs=f.bcs).with_data(
        jnp.asarray(step_vals))
    g = fvc.grad(mesh16, fs)
    gl = np.asarray(fvc.grad_cell_limited(mesh16, fs, g, 1.0))
    assert (np.linalg.norm(gl, axis=1)
            <= np.linalg.norm(np.asarray(g), axis=1) + 1e-12).all()
    # check the bound explicitly on internal cells
    data = step_vals
    cnbr = np.asarray(mesh16.cnbr)
    valid = np.asarray(mesh16.cnbr_valid)
    cfc = np.asarray(mesh16.cf)
    cface = np.asarray(mesh16.cface)
    pres = np.abs(np.asarray(mesh16.csign))
    vn = np.where(valid > 0, data[cnbr], np.nan)
    vmax = np.nanmax(np.where(valid > 0, vn, -np.inf), axis=1)
    vmin = np.nanmin(np.where(valid > 0, vn, np.inf), axis=1)
    rvec = (cfc[cface] - c[:, None, :]) * pres[:, :, None]
    ext = np.einsum("cki,ci->ck", rvec, gl)
    # only internal-face extrapolations (boundary handled via BC values)
    ok = ext <= np.maximum(vmax - data, 0.0)[:, None] + 1e-6
    ok &= ext >= np.minimum(vmin - data, 0.0)[:, None] - 1e-6
    ok |= valid == 0
    assert ok.all()


def test_grad_of_dispatch(mesh16):
    f = _linear_scalar(mesh16)
    for scheme in ("Gauss linear", "leastSquares",
                   "cellLimited Gauss linear 1",
                   "cellLimited leastSquares 0.5"):
        g = np.asarray(fvc.grad_of(mesh16, f, scheme))
        np.testing.assert_allclose(g[:, 0], 2.0, atol=1e-3,
                                   err_msg=scheme)
    with pytest.raises(ValueError):
        fvc.grad_of(mesh16, f, "bogus")


# ---------------------------------------------------------------------------
# ddt temporal accuracy on pure decay dT/dt = -T  (T -> exp(-t))
# ---------------------------------------------------------------------------


def _decay_error(mesh, scheme: str, n_steps: int, t_end=0.5):
    dt = t_end / n_steps
    rdt = jnp.asarray(1.0 / dt, mesh.v.dtype)
    T = vol_scalar(mesh, 1.0)
    data = T.data
    old = data
    old_old = data
    ddt0 = jnp.zeros_like(data)
    ctl = {"solver": "diagonal"}
    lam = jnp.ones_like(data)
    for i in range(n_steps):
        if scheme == "Euler":
            m = fvm.ddt(mesh, T, old, rdt)
        elif scheme == "backward":
            rdt0 = jnp.asarray(1e-30 if i == 0 else 1.0 / dt, mesh.v.dtype)
            m = fvm.ddt_backward(mesh, T, old, old_old, rdt, rdt0)
        elif scheme == "CN":
            rdt0 = jnp.asarray(1e-30 if i == 0 else 1.0 / dt, mesh.v.dtype)
            m = fvm.ddt_crank_nicolson(mesh, T, old, ddt0, rdt, 1.0,
                                       rdt0=rdt0)
        m = m + fvm.Sp(mesh, lam, T)
        new, _ = linear.solve(mesh, m, old, ctl)
        if scheme == "CN":
            ddt0 = fvm.ddt_cn_update(new, old, ddt0, rdt, 1.0, rdt0=rdt0)
        old_old = old
        old = new
    exact = np.exp(-t_end)
    return abs(float(old[0]) - exact)


@pytest.fixture(scope="module")
def mesh4():
    return to_device(cavity_mesh(4))


def test_backward_ddt_second_order(mesh4):
    e1 = _decay_error(mesh4, "backward", 16)
    e2 = _decay_error(mesh4, "backward", 32)
    ratio = e1 / max(e2, 1e-14)
    assert ratio > 3.0, f"backward not 2nd order: ratio {ratio}"
    # and beats Euler at equal step count
    assert e1 < _decay_error(mesh4, "Euler", 16) / 3


def test_crank_nicolson_second_order(mesh4):
    e1 = _decay_error(mesh4, "CN", 16)
    e2 = _decay_error(mesh4, "CN", 32)
    ratio = e1 / max(e2, 1e-14)
    assert ratio > 3.0, f"CN not 2nd order: ratio {ratio}"


def test_euler_first_order(mesh4):
    e1 = _decay_error(mesh4, "Euler", 16)
    e2 = _decay_error(mesh4, "Euler", 32)
    ratio = e1 / max(e2, 1e-14)
    assert 1.5 < ratio < 2.6, f"Euler not 1st order: ratio {ratio}"


# ---------------------------------------------------------------------------
# fvSchemes keyword dispatch + backward-PISO integration
# ---------------------------------------------------------------------------


def test_case_scheme_dispatch(tmp_path):
    from foamtpu.core.case import Case

    (tmp_path / "system").mkdir()
    (tmp_path / "system" / "controlDict").write_text(
        "application icoFoam; startTime 0; endTime 1; deltaT 0.1;\n"
        "writeControl timeStep; writeInterval 10;\n")
    (tmp_path / "system" / "fvSchemes").write_text("""
ddtSchemes { default backward; }
gradSchemes { default Gauss linear; grad(p) cellLimited Gauss linear 1; }
divSchemes { default none; div(phi,U) Gauss limitedLinear 1; }
laplacianSchemes { default Gauss linear corrected; }
""")
    (tmp_path / "system" / "fvSolution").write_text(
        "solvers { p { solver PCG; tolerance 1e-6; } }\n")
    case = Case(str(tmp_path))
    assert case.ddt_scheme() == "backward"
    assert case.grad_scheme("grad(p)") == "cellLimited Gauss linear 1"
    assert case.grad_scheme("grad(U)") == "Gauss linear"
    assert case.div_scheme("div(phi,U)") == "limitedLinear 1"
    assert case.laplacian_corrected()


def test_piso_backward_ddt_runs():
    """PISO with backward ddt: state plumbing (U00, rdt0) works and the
    cavity stays stable and conservative."""
    import jax
    from foamtpu.apps.cases import make_cavity
    from foamtpu.solvers import piso

    mesh, state0, cfg = make_cavity(16)
    cfg = cfg._replace(ddt_scheme="backward")
    mesh_, U, p = mesh, state0["U"], state0["p"]
    state = piso.initial_state(mesh, U, p, ddt_scheme="backward")
    assert "U00" in state and "rdt0" in state
    step = jax.jit(lambda s, d: piso.piso_step(mesh, s, d, cfg))
    dt = jnp.asarray(0.005, mesh.v.dtype)
    for _ in range(3):
        state, diag = step(state, dt)
    assert float(diag["continuity"]) < 1e-4
    assert np.isfinite(np.asarray(state["U"].data)).all()
