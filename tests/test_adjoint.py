"""adjointShapeOptimizationFoam tests (reference: applications/
solvers/incompressible/adjointShapeOptimizationFoam/)."""

import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import adjoint, simple as simple_mod

# a channel with a side pocket: flow through the straight part; the
# pocket is dead volume the optimizer should block (alpha grows there)
DUCT = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 0.2 0) (0 0.2 0)
    (0 0 0.02) (1 0 0.02) (1 0.2 0.02) (0 0.2 0.02)
);
blocks ( hex (0 1 2 3 4 5 6 7) (25 10 1) simpleGrading (1 1 1) );
boundary
(
    inlet  { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls  { type wall; faces ((1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def _fields(mesh):
    ub, pb, uab, pab = [], [], [], []
    for pt in mesh.patches:
        if pt.type == "empty":
            for lst in (ub, pb, uab, pab):
                lst.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif pt.name == "inlet":
            ub.append(pf.fixed_value(jnp.asarray([1.0, 0.0, 0.0])))
            pb.append(pf.zero_gradient())
            # adjoint inlet: Ua = -U_in (power-dissipation objective)
            uab.append(pf.fixed_value(jnp.asarray([-1.0, 0.0, 0.0])))
            pab.append(pf.zero_gradient())
        elif pt.name == "outlet":
            ub.append(pf.zero_gradient())
            pb.append(pf.fixed_value(0.0))
            uab.append(pf.zero_gradient())
            pab.append(pf.fixed_value(0.0))
        else:
            ub.append(pf.fixed_value(jnp.zeros(3)))
            pb.append(pf.zero_gradient())
            uab.append(pf.fixed_value(jnp.zeros(3)))
            pab.append(pf.zero_gradient())
    U = vol_vector(mesh, (1.0, 0.0, 0.0), name="U", bcs=tuple(ub))
    p = vol_scalar(mesh, 0.0, name="p", bcs=tuple(pb))
    Ua = vol_vector(mesh, (0.0, 0.0, 0.0), name="Ua", bcs=tuple(uab))
    pa = vol_scalar(mesh, 0.0, name="pa", bcs=tuple(pab))
    return U, p, Ua, pa


def test_adjoint_optimization_converges_and_bounds_alpha():
    """The coupled primal/adjoint sweep converges: residuals fall,
    alpha stays in [0, alphaMax], inlet cells stay at alpha = 0, and
    the adjoint velocity responds to the primal flow."""
    mesh = to_device(blockmesh.generate(parse_string(DUCT)))
    U, p, Ua, pa = _fields(mesh)
    owner = np.asarray(mesh.owner)
    inlet = [pt for pt in mesh.patches if pt.name == "inlet"][0]
    inlet_cells = jnp.asarray(
        np.unique(owner[inlet.slice]).astype(np.int32))
    flow = simple_mod.SimpleConfig(nu=1e-3, alpha_u=0.7, alpha_p=0.3)
    cfg = adjoint.AdjointConfig(flow=flow, lam=1e3, alpha_max=200.0,
                                alpha_relax=0.1,
                                zero_alpha_cells=inlet_cells)
    state = adjoint.initial_state(mesh, U, p, Ua, pa, cfg)
    step = adjoint.make_step(mesh, cfg)
    first = None
    for i in range(30):
        state, diag = step(state)
        if i == 0:
            first = float(np.max(np.asarray(diag["p_initial"])))
    last = float(np.max(np.asarray(diag["p_initial"])))
    assert last < 0.5 * first, "primal not converging"
    a = np.asarray(state["alpha"])
    assert a.min() >= 0.0 and a.max() <= 200.0
    assert float(np.abs(a[np.asarray(inlet_cells)]).max()) == 0.0
    assert float(jnp.max(jnp.abs(state["Ua"].data))) > 1e-6, \
        "adjoint field never responded"
    assert np.isfinite(float(diag["objective"]))


def test_alpha_sink_blocks_flow():
    """Sanity of the design variable: a large alpha band across the
    channel kills the flux through it (the mechanism the optimizer
    uses)."""
    mesh = to_device(blockmesh.generate(parse_string(DUCT)))
    U, p, Ua, pa = _fields(mesh)
    flow = simple_mod.SimpleConfig(nu=1e-3, alpha_u=0.7, alpha_p=0.3)
    cfg = adjoint.AdjointConfig(flow=flow)
    state = adjoint.initial_state(mesh, U, p, Ua, pa, cfg)
    c = np.asarray(mesh.c)
    band = (c[:, 0] > 0.45) & (c[:, 0] < 0.55) & (c[:, 1] > 0.1)
    alpha = np.zeros(mesh.n_cells)
    alpha[band] = 1e4
    state["alpha"] = jnp.asarray(alpha, mesh.v.dtype)
    import jax

    prim = jax.jit(lambda s: adjoint._primal_with_alpha(mesh, s, cfg))
    for _ in range(30):
        state, diag = prim(state)
    Ud = np.asarray(state["U"].data)
    u_band = np.abs(Ud[band, 0]).mean()
    u_free = np.abs(Ud[(c[:, 0] > 0.45) & (c[:, 0] < 0.55)
                       & (c[:, 1] <= 0.1), 0]).mean()
    assert u_band < 0.1 * u_free, (u_band, u_free)
