"""twoPhaseEulerFoam (solvers/twophaseeuler.py): Euler-Euler two-phase
with Schiller-Naumann drag (reference: applications/solvers/multiphase/
twoPhaseEulerFoam/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import CAVITY_BLOCKMESH
from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import twophaseeuler as tpe


def test_bubble_band_rises():
    """Closed water box with a dispersed air band in the lower half:
    buoyancy drives the air up THROUGH the water (Ua_y > Ub_y where
    alpha > 0), the alpha centroid rises, alpha stays bounded, and the
    total air content is conserved."""
    d = parse_string(CAVITY_BLOCKMESH.replace("{n}", "16"))
    mesh = to_device(blockmesh.generate(d))
    bw, bzg = [], []
    for p_ in mesh.patches:
        if p_.type == "empty":
            bw.append(pf.PatchField(kind="empty", vfrac=0.0))
            bzg.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            bw.append(pf.fixed_value(jnp.zeros(3)))
            bzg.append(pf.zero_gradient())
    Ua = vol_vector(mesh, jnp.zeros(3), name="Ua", dims=dimVelocity,
                    bcs=tuple(bw))
    Ub = vol_vector(mesh, jnp.zeros(3), name="Ub", dims=dimVelocity,
                    bcs=tuple(bw))
    p = vol_scalar(mesh, 0.0, name="p", dims=DimensionSet.of(1, -1, -2),
                   bcs=tuple(bzg))
    c = np.asarray(mesh.c)
    band = (c[:, 1] > 0.02) & (c[:, 1] < 0.04)
    alpha0 = jnp.asarray(np.where(band, 0.1, 1e-4).astype(np.float32))
    alpha = vol_scalar(mesh, 0.0, name="alpha",
                       bcs=tuple(bzg)).with_data(alpha0)
    cfg = tpe.TwoPhaseConfig(n_correctors=2)
    state = tpe.initial_state(mesh, Ua, Ub, p, alpha)
    step = tpe.make_step(mesh, cfg)
    v = np.asarray(mesh.v)
    m_air0 = float((np.asarray(alpha0) * v).sum())
    y0 = float((np.asarray(alpha0) * v * c[:, 1]).sum() / m_air0)
    dt = jnp.asarray(2e-4, mesh.v.dtype)
    for _ in range(40):
        state, diag = step(state, dt)
    a = np.asarray(state["alpha"].data)
    ua = np.asarray(state["Ua"].data)
    ub = np.asarray(state["Ub"].data)
    assert np.isfinite(a).all() and np.isfinite(ua).all() \
        and np.isfinite(ub).all()
    assert a.min() > -1e-5 and a.max() < 1.0 + 1e-5
    # air rises relative to water where there is air
    sel = a > 0.02
    assert (ua[sel, 1] - ub[sel, 1]).mean() > 1e-3
    # centroid of the air band moved up
    m_air = float((a * v).sum())
    y1 = float((a * v * c[:, 1]).sum() / m_air)
    assert y1 > y0 + 1e-4
    # air content conserved in the closed box
    assert abs(m_air - m_air0) / m_air0 < 2e-2
