"""cavitatingFoam: barotropic homogeneous-equilibrium cavitation
(reference: applications/solvers/multiphase/cavitatingFoam/)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import CAVITY_BLOCKMESH
from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import cavitating as cav


def test_eos_roundtrip():
    cfg = cav.CavitatingConfig()
    p = jnp.asarray([1e5, 5e4, 2300.0, 1000.0])
    g0 = jnp.zeros(4)
    rho = cav.rho_of(cfg, p, g0)
    # pure liquid branch: p back from rho
    pb = cav.p_of(cfg, rho, g0)
    # f32 density quantum (~6e-5 at rho~1000) maps to ~130 Pa of p
    # noise through psil — the roundtrip is exact to that floor
    assert np.allclose(np.asarray(pb), np.asarray(p), atol=300.0)
    # below-saturation density -> vapour fraction appears
    rhol_sat, rhov_sat = cav.saturation_densities(cfg)
    rr = jnp.asarray([rhol_sat, 0.5 * (rhol_sat + rhov_sat), rhov_sat])
    g = np.asarray(cav.gamma_of(cfg, rr))
    assert abs(g[0]) < 1e-6 and abs(g[1] - 0.5) < 1e-6 \
        and abs(g[2] - 1.0) < 1e-6


def test_low_pressure_pocket_cavitates():
    """A closed liquid box initialised with a deep low-pressure pocket:
    the pocket flashes to vapour (gamma > 0 exactly where p fell to
    pSat), mass is conserved, and the fields stay finite/bounded."""
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
    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(bw))
    c = np.asarray(mesh.c)
    pocket = ((c[:, 0] - 0.05) ** 2 + (c[:, 1] - 0.05) ** 2) < 0.02 ** 2
    p0 = np.where(pocket, 1500.0, 1e5).astype(np.float32)
    p = vol_scalar(mesh, 0.0, name="p",
                   dims=DimensionSet.of(1, -1, -2),
                   bcs=tuple(bzg)).with_data(jnp.asarray(p0))
    cfg = cav.CavitatingConfig(n_outer=2, n_correctors=2)
    state = cav.initial_state(mesh, U, p, cfg)
    v = np.asarray(mesh.v)
    m0 = float((np.asarray(state["rho"]) * v).sum())
    # the pocket starts BELOW pSat -> vapour from the EOS at t=0
    g_init = np.asarray(cav.gamma_of(cfg, state["rho"]))
    assert g_init[pocket].max() > 0.0
    step = cav.make_step(mesh, cfg)
    dt = jnp.asarray(2e-6, mesh.v.dtype)
    gmax_hist = []
    for _ in range(25):
        state, diag = step(state, dt)
        gmax_hist.append(float(diag["gamma_max"]))
    pv = np.asarray(state["p"].data)
    rho = np.asarray(state["rho"])
    u = np.asarray(state["U"].data)
    g = np.asarray(cav.gamma_of(cfg, rho))
    assert np.isfinite(pv).all() and np.isfinite(rho).all() \
        and np.isfinite(u).all()
    assert g.min() >= 0.0 and g.max() <= 1.0
    # the pocket held vapour while the liquid rushed in, and the
    # collapse (recompression) is itself the physical outcome
    assert max(gmax_hist) > 0.0
    # mass conservation (closed box)
    m1 = float((rho * v).sum())
    assert abs(m1 - m0) / m0 < 2e-2
    # far field still liquid at ~ambient pressure
    far = ~pocket & (np.abs(c[:, 0] - 0.05) > 0.035)
    assert g[far].max() < 1e-3
