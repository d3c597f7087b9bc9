"""twoLiquidMixingFoam (reference: applications/solvers/multiphase/
twoLiquidMixingFoam/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import CAVITY_BLOCKMESH
from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import twoliquidmixing as tlm


def test_stratified_liquids_diffuse_and_conserve():
    """Heavy liquid below, light above (stable stratification): alpha
    diffuses across the interface at the Dab rate, total solute is
    conserved, the field stays bounded, and no spurious currents
    develop beyond the diffusive scale."""
    d = parse_string(CAVITY_BLOCKMESH.replace("{n}", "16"))
    mesh = to_device(blockmesh.generate(d))
    bw, bzg = [], []
    for p in mesh.patches:
        if p.type == "empty":
            bw.append(pf.PatchField(kind="empty", vfrac=0.0))
            bzg.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bw.append(pf.fixed_value(jnp.zeros(3)))
            bzg.append(pf.zero_gradient())
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(bw))
    p_rgh = vol_scalar(mesh, 0.0, name="p_rgh",
                       dims=DimensionSet.of(1, -1, -2), bcs=tuple(bzg))
    c = np.asarray(mesh.c)
    alpha0 = jnp.asarray((c[:, 1] < 0.05).astype(np.float32))
    alpha = vol_scalar(mesh, 0.0, name="alpha",
                       bcs=tuple(bzg)).with_data(alpha0)
    cfg = tlm.TwoLiquidConfig(rho1=1010.0, rho2=1000.0, Dab=5e-5,
                              n_correctors=2)
    state = tlm.initial_state(mesh, U, p_rgh, alpha, cfg)
    step = tlm.make_step(mesh, cfg)
    v = np.asarray(mesh.v)
    m0 = float((np.asarray(alpha0) * v).sum())
    dt = jnp.asarray(5e-3, mesh.v.dtype)
    for _ in range(30):
        state, diag = step(state, dt)
    a = np.asarray(state["alpha"].data)
    u = np.asarray(state["U"].data)
    assert np.isfinite(a).all() and np.isfinite(u).all()
    assert a.min() > -1e-5 and a.max() < 1.0 + 1e-5
    # solute conserved (sealed box, zero-gradient walls)
    assert abs(float((a * v).sum()) - m0) / m0 < 1e-3
    # interface smeared: the sharp 0/1 step now has intermediate values
    mid = (c[:, 1] > 0.04) & (c[:, 1] < 0.06)
    assert ((a[mid] > 0.05) & (a[mid] < 0.95)).any()
    # diffusive smearing width ~ sqrt(4 Dab t) = sqrt(4*5e-5*0.15) ~ 5mm
    lo = c[:, 1] < 0.02
    hi = c[:, 1] > 0.08
    assert a[lo].min() > 0.9 and a[hi].max() < 0.1
    # stable stratification: no significant convection
    assert np.abs(u).max() < 0.02
