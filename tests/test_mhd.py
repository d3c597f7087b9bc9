"""mhdFoam: incompressible MHD — Hartmann channel flow validation
(reference: applications/solvers/electromagnetics/mhdFoam/ +
tutorials/electromagnetics/mhdFoam/hartmann)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu.bc import patchfields as pf
from foamtpu.core.dictionary import parse_string
from foamtpu.core.dimensions import DimensionSet, dimVelocity
from foamtpu.core.fields import vol_scalar, vol_vector
from foamtpu.mesh import blockmesh, to_device
from foamtpu.solvers import mhd

CHANNEL = """
convertToMeters 1;
vertices (
    (0 -1 0) (20 -1 0) (20 1 0) (0 1 0)
    (0 -1 0.1) (20 -1 0.1) (20 1 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (20 24 1) simpleGrading (1 1 1) );
boundary (
    inlet  { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls  { type wall; faces ((1 5 4 0) (3 7 6 2)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def test_hartmann_profile():
    """Fully developed MHD channel flow with transverse B: the velocity
    profile follows cosh: u(y)/u(0) = (cosh Ha - cosh(Ha y/L)) /
    (cosh Ha - 1). Ha = B L sqrt(sigma/(rho nu)) = 20 * 1 * 1 = 20 with
    the hartmann tutorial's properties."""
    mesh = to_device(blockmesh.generate(parse_string(CHANNEL)))
    nu, rho, sigma_c, mu_mag = 1.0, 1.0, 1.0, 1.0
    By = 20.0
    Ha = By * 1.0 * np.sqrt(sigma_c / (rho * nu))

    ubcs, pbcs, bbcs, pbbcs = [], [], [], []
    for p in mesh.patches:
        if p.type == "empty":
            for lst in (ubcs, pbcs, bbcs, pbbcs):
                lst.append(pf.PatchField(kind="empty", vfrac=0.0))
        elif p.name == "inlet":
            ubcs.append(pf.fixed_value(jnp.asarray([1.0, 0.0, 0.0])))
            pbcs.append(pf.zero_gradient())
            bbcs.append(pf.fixed_value(jnp.asarray([0.0, By, 0.0])))
            pbbcs.append(pf.zero_gradient())
        elif p.name == "outlet":
            ubcs.append(pf.zero_gradient())
            pbcs.append(pf.fixed_value(0.0))
            bbcs.append(pf.fixed_value(jnp.asarray([0.0, By, 0.0])))
            pbbcs.append(pf.zero_gradient())
        else:
            ubcs.append(pf.fixed_value(jnp.zeros(3)))
            pbcs.append(pf.zero_gradient())
            bbcs.append(pf.fixed_value(jnp.asarray([0.0, By, 0.0])))
            pbbcs.append(pf.fixed_value(0.0))
    U = vol_vector(mesh, jnp.asarray([1.0, 0.0, 0.0]), name="U",
                   dims=dimVelocity, bcs=tuple(ubcs))
    p = vol_scalar(mesh, 0.0, name="p", dims=DimensionSet.of(0, 2, -2),
                   bcs=tuple(pbcs))
    B = vol_vector(mesh, jnp.asarray([0.0, By, 0.0]), name="B",
                   dims=dimVelocity, bcs=tuple(bbcs))
    pB = vol_scalar(mesh, 0.0, name="pB",
                    dims=DimensionSet.of(0, 2, -2), bcs=tuple(pbbcs))
    cfg = mhd.MhdConfig(nu=nu, rho=rho, mu_mag=mu_mag, sigma_c=sigma_c,
                        n_correctors=2)
    state = mhd.initial_state(mesh, U, p, B, pB)
    step = mhd.make_step(mesh, cfg)
    dt = jnp.asarray(0.005, mesh.v.dtype)
    diag = None
    for _ in range(150):
        state, diag = step(state, dt)
    u = np.asarray(state["U"].data)
    assert np.isfinite(u).all()
    assert float(diag["divB"]) < 1e-3
    c = np.asarray(mesh.c)
    # profile at mid-channel (x ~ 15, past development length)
    sel = np.abs(c[:, 0] - 15.5) < 0.5
    y = c[sel, 1]
    ux = u[sel, 0]
    order = np.argsort(y)
    y, ux = y[order], ux[order]
    prof = ux / ux.max()
    exact = (np.cosh(Ha) - np.cosh(Ha * y)) / (np.cosh(Ha) - 1.0)
    # Hartmann layers (thickness 1/Ha = 0.05) are under-resolved on 24
    # cells; compare the CORE profile
    core = np.abs(y) < 0.8
    assert np.abs(prof[core] - exact[core]).max() < 0.1
    # flat core (the Hartmann signature, vs parabolic Poiseuille)
    assert prof[np.abs(y) < 0.5].min() > 0.9
