"""compressibleInterFoam (solvers/compressibleinter.py): two
compressible phases + MULES VOF (reference: applications/solvers/
multiphase/compressibleInterFoam/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import CAVITY_BLOCKMESH
from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import VolField, vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import compressibleinter as ci


def _box(n=16):
    d = parse_string(CAVITY_BLOCKMESH.replace("{n}", str(n)))
    return to_device(blockmesh.generate(d))


def _fields(mesh, alpha0):
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
    p_rgh = vol_scalar(mesh, 1e5, name="p_rgh",
                       dims=DimensionSet.of(1, -1, -2), bcs=tuple(bzg))
    T = vol_scalar(mesh, 300.0, name="T",
                   dims=DimensionSet.of(0, 0, 0, 1), bcs=tuple(bzg))
    alpha = vol_scalar(mesh, 0.0, name="alpha", bcs=tuple(bzg))
    alpha = alpha.with_data(alpha0)
    return U, p_rgh, T, alpha


def test_depthcharge_box_bounded_and_conservative():
    """Closed box: water below, a high-pressure gas pocket above-centre
    (depthCharge-style). The bubble expands, pressure relaxes toward
    equilibrium, alpha stays bounded, and each phase's mass is
    conserved."""
    mesh = _box(16)
    c = np.asarray(mesh.c)
    # gas pocket: alpha1 = 1 in a central blob, water elsewhere
    blob = ((c[:, 0] - 0.05) ** 2 + (c[:, 1] - 0.06) ** 2) < 0.018 ** 2
    alpha0 = jnp.asarray(blob.astype(np.float32))
    U, p_rgh, T, alpha = _fields(mesh, alpha0)
    # overpressure inside the pocket
    p_rgh = p_rgh.with_data(jnp.where(alpha0 > 0.5, 5e5, 1e5))
    cfg = ci.CompIntConfig(n_correctors=2, momentum_predictor=True,
                           g=(0.0, -9.81, 0.0))
    state = ci.initial_state(mesh, U, p_rgh, T, alpha, cfg)
    v = np.asarray(mesh.v)
    a0 = np.asarray(state["alpha"].data)
    rho1_0, rho2_0, _, _ = ci.phase_props(cfg, state["p_abs"],
                                          state["T"].data)
    m1_0 = float((a0 * np.asarray(rho1_0) * v).sum())
    m2_0 = float(((1 - a0) * np.asarray(rho2_0) * v).sum())

    step = ci.make_step(mesh, cfg)
    dt = jnp.asarray(2e-5, mesh.v.dtype)
    for _ in range(25):
        state, diag = step(state, dt)
    a = np.asarray(state["alpha"].data)
    p_abs = np.asarray(state["p_abs"])
    assert np.isfinite(a).all() and np.isfinite(p_abs).all()
    assert a.min() > -1e-4 and a.max() < 1.0 + 1e-4
    # closed box of nearly incompressible liquid: the gas overpressure
    # equilibrates the WHOLE box toward the pocket pressure — the
    # initial 4e5 Pa spread collapses to a nearly uniform field
    assert p_abs.max() < 5.5e5 and p_abs.min() > 1e4
    assert (p_abs.max() - p_abs.min()) < 0.2 * 4e5
    rho1_n, rho2_n, _, _ = ci.phase_props(cfg, state["p_abs"],
                                          state["T"].data)
    # liquid mass conservation (closed box, fixed walls)
    m2 = float(((1 - a) * np.asarray(rho2_n) * v).sum())
    assert abs(m2 - m2_0) / m2_0 < 1e-2
    # gas mass within the operator-split tolerance
    m1 = float((a * np.asarray(rho1_n) * v).sum())
    assert abs(m1 - m1_0) / m1_0 < 0.2
    u = np.asarray(state["U"].data)
    assert np.isfinite(u).all()
