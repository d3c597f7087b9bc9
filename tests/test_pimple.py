"""pimpleFoam tests (reference: pimpleControl semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import make_cavity
from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import pimple, piso

CHANNEL_BLOCKMESH = """
convertToMeters 0.1;
vertices
(
    (0 0 0) (4 0 0) (4 1 0) (0 1 0)
    (0 0 0.1) (4 0 0.1) (4 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (32 8 1) simpleGrading (1 1 1) );
boundary
(
    inlet { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls { type wall; faces ((3 7 6 2) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def make_channel(ubar=1.0, nu=0.01):
    """Open channel: fixedValue inlet, zeroGradient outlet for U,
    all-Neumann p (the adjustPhi-requiring configuration)."""
    d = parse_string(CHANNEL_BLOCKMESH)
    mesh = to_device(blockmesh.generate(d))
    ubcs, pbcs = [], []
    for patch in mesh.patches:
        if patch.type == "empty":
            ubcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            pbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif patch.name == "inlet":
            ubcs.append(pf.fixed_value(jnp.asarray([ubar, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())
        elif patch.name == "outlet":
            ubcs.append(pf.zero_gradient())
            pbcs.append(pf.zero_gradient())
        else:
            ubcs.append(pf.fixed_value(jnp.asarray([0.0, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.asarray([ubar, 0.0, 0.0]), name="U",
                   dims=dimVelocity, bcs=tuple(ubcs))
    p = vol_scalar(mesh, 0.0, name="p", dims=DimensionSet.of(0, 2, -2),
                   bcs=tuple(pbcs))
    return mesh, U, p


def test_n_outer_1_reduces_to_piso():
    """pimpleControl with nOuterCorrectors=1 IS PISO: identical fields
    from the same initial state."""
    mesh, state, pcfg = make_cavity(16)
    dt = jnp.asarray(0.005, mesh.v.dtype)

    cfg1 = pimple.PimpleConfig(
        nu=pcfg.nu, n_outer=1, n_correctors=pcfg.n_correctors,
        n_non_orth=pcfg.n_non_orth, p_controls=pcfg.p_controls,
        u_controls=pcfg.u_controls,
        alpha_u=0.7, alpha_p=0.3,  # must be IGNORED on the final iter
    )
    s_pimple, d_pimple = jax.jit(
        lambda s, d: pimple.pimple_step(mesh, s, d, cfg1))(state, dt)
    s_piso, d_piso = jax.jit(
        lambda s, d: piso.piso_step(mesh, s, d, pcfg))(state, dt)

    np.testing.assert_allclose(np.asarray(s_pimple["U"].data),
                               np.asarray(s_piso["U"].data), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_pimple["p"].data),
                               np.asarray(s_piso["p"].data), atol=1e-6)


def test_outer_correctors_converge_large_dt():
    """At Courant ~ 4 plain PISO residuals stay high; outer correctors
    with relaxation drive the final pressure residual down (the point
    of PIMPLE)."""
    mesh, state, pcfg = make_cavity(16)
    # lid U=1, dx=0.1/16 -> Co = dt*U/dx: dt=0.025 ~ Co 4
    dt = jnp.asarray(0.025, mesh.v.dtype)
    base = dict(nu=pcfg.nu, n_correctors=2,
                p_controls=pcfg.p_controls, u_controls=pcfg.u_controls)

    cfg = pimple.PimpleConfig(n_outer=4, alpha_u=0.7, alpha_p=0.3, **base)
    step = jax.jit(lambda s, d: pimple.pimple_step(mesh, s, d, cfg))
    s = state
    for _ in range(3):
        s, diag = step(s, dt)
    assert np.isfinite(np.asarray(s["U"].data)).all()
    assert float(diag["continuity"]) < 1e-5
    # the outer loop must have reduced the first-corrector residual:
    # by the last outer iteration the p equation starts nearly converged
    assert float(diag["p_final"]) < 1e-5


def test_piso_open_boundary_mass_conservation():
    """Transient channel with fixedValue inlet + zeroGradient outlet and
    all-Neumann p: adjustPhi must keep global mass balanced every step
    (regression for the r1 missing-adjustPhi hole, ADVICE.md #3)."""
    mesh, U, p = make_channel()
    cfg = piso.PisoConfig(nu=0.01, n_correctors=2)
    assert piso.needs_reference(p, mesh)
    state = piso.initial_state(mesh, U, p)
    step = jax.jit(lambda s, d: piso.piso_step(mesh, s, d, cfg))
    dt = jnp.asarray(0.002, mesh.v.dtype)
    for _ in range(5):
        state, diag = step(state, dt)
    # net boundary flux == 0 (mass conserved globally)
    nif = mesh.n_internal_faces
    phib = np.asarray(state["phi"])[nif:]
    act = np.asarray(mesh.face_active)[nif:]
    influx = float(np.abs((phib * act)[phib < 0].sum()))
    net = float((phib * act).sum())
    assert abs(net) < 1e-6 * max(influx, 1e-30)
    # and the cell-wise continuity error is small (f32 solve floor)
    assert float(diag["continuity"]) < 1e-4
    assert np.isfinite(np.asarray(state["U"].data)).all()
