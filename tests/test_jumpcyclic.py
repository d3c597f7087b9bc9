"""fixedJump / fan cyclic-jump boundary conditions.

Reference: src/finiteVolume/fields/fvPatchFields/derived/{fixedJump,
fan}/ — jumpCyclic conditions on coincident (createBaffles-style)
cyclic pairs. Here the pair is retained as identity-AMI coupled
patches; the jump enters the laplacian implicitly (constant in the
boundary source), so a 1D Poisson solve reproduces the analytic
piecewise-linear profile with the prescribed discontinuity."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from foamtpu.bc import factory, patchfields as pf
from foamtpu.core.dictionary import FoamDict, parse_string
from foamtpu.core.dimensions import DimensionSet
from foamtpu.core.fields import vol_scalar
from foamtpu.mesh import blockmesh, to_device
from foamtpu.ops import fvm
from foamtpu.solvers import linear

# single duct; the fan pair is cut in by create_baffles at x=1 — the
# reference workflow (createBaffles cyclic pair feeding jumpCyclic BCs)
DUCT = """
convertToMeters 1;
vertices
(
    (0 0 0) (2 0 0) (2 1 0) (0 1 0)
    (0 0 1) (2 0 1) (2 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (16 1 1) simpleGrading (1 1 1) );
boundary
(
    left  { type patch; faces ((0 4 7 3)); }
    right { type patch; faces ((2 6 5 1)); }
    walls { type wall; faces ((3 7 6 2) (1 5 4 0) (0 3 2 1) (4 5 6 7)); }
);
"""

JUMP = 0.5


def _mesh():
    from foamtpu.apps.meshutils3 import create_baffles

    pm = blockmesh.generate(parse_string(DUCT))
    fids = np.nonzero(np.abs(pm.cf[:pm.n_internal_faces, 0] - 1.0)
                      < 1e-6)[0]
    pm = create_baffles(pm, fids, "fan", "cyclic")
    # the case loader retypes jump pairs to retained cyclicAMI patches
    patches = [dataclasses.replace(p, type="cyclicAMI")
               if p.name in ("fan_master", "fan_slave") else p
               for p in pm.patches]
    return to_device(dataclasses.replace(pm, patches=patches))


def _bcs(mesh, spec_by_patch):
    bcs = []
    for p in mesh.patches:
        spec = spec_by_patch.get(p.name)
        if spec is None:
            bcs.append(pf.zero_gradient())
        else:
            bcs.append(factory.from_dict(FoamDict(spec), p, 0,
                                         np.float32, mesh=mesh))
    return tuple(bcs)


def _solve_poisson(mesh, bcs):
    p = vol_scalar(mesh, 0.0, name="p",
                   dims=DimensionSet.of(0, 2, -2), bcs=bcs)
    eqn = fvm.laplacian(mesh, jnp.ones(mesh.n_faces, mesh.v.dtype), p,
                        corrected=False)
    data, perf = linear.solve(mesh, eqn, p.data,
                              {"solver": "PCG", "preconditioner":
                               "diagonal", "tolerance": 1e-9,
                               "relTol": 0.0, "maxIter": 500})
    return np.asarray(data)


def test_fixed_jump_reproduces_discontinuous_profile():
    mesh = _mesh()
    bcs = _bcs(mesh, {
        "left": [("type", "fixedValue"), ("value", ["uniform", 0.0])],
        "right": [("type", "fixedValue"), ("value", ["uniform", 1.0])],
        "fan_master": [("type", "fixedJump"), ("patchType", "cyclic"),
                 ("jump", ["uniform", JUMP])],
        "fan_slave": [("type", "fixedJump"), ("patchType", "cyclic"),
                 ("jump", ["uniform", JUMP])],
    })
    sol = _solve_poisson(mesh, bcs)
    x = np.asarray(mesh.c)[:, 0]
    # analytic (jump +J rises master->slave): p = g x (x<1),
    # g x + J (x>1), p(2)=1 -> g = (1-J)/2
    g = (1.0 - JUMP) / 2.0
    ref = np.where(x < 1.0, g * x, g * x + JUMP)
    np.testing.assert_allclose(sol, ref, atol=2e-4)


def test_fan_update_sets_jump_from_flux_polynomial():
    mesh = _mesh()
    spec = [("type", "fan"), ("patchType", "cyclic"),
            ("f", [1.0, -2.0])]          # jump(Q) = 1 - 2 Q
    pa = mesh.patch("fan_master")
    bc = factory.from_dict(FoamDict(spec), pa, 0, np.float32, mesh=mesh)
    assert bc.kind == "fan" and bc.opt("master") is True
    phi = jnp.zeros(mesh.n_faces, mesh.v.dtype)
    # outflow 0.1 m^3/s through fanA (uniform over its faces)
    area = float(jnp.sum(mesh.mag_sf[pa.slice]))
    phi = phi.at[pa.slice].set(0.1 * mesh.mag_sf[pa.slice] / area)
    internal = jnp.zeros(mesh.n_cells, mesh.v.dtype)
    bc2 = pf.update(bc, mesh, pa, internal, phi=phi)
    np.testing.assert_allclose(np.asarray(bc2.ref_value),
                               1.0 - 2.0 * 0.1, rtol=1e-5)
    # slave side negates the measured flow direction
    pb = mesh.patch("fan_slave")
    bcb = factory.from_dict(FoamDict(spec), pb, 0, np.float32, mesh=mesh)
    assert bcb.opt("master") is False


def test_fan_zero_flow_jump_drives_flow():
    """fan with jump(Q)=J0 const: same solve as fixedJump."""
    mesh = _mesh()
    bcs = _bcs(mesh, {
        "left": [("type", "fixedValue"), ("value", ["uniform", 0.0])],
        "right": [("type", "fixedValue"), ("value", ["uniform", 0.0])],
        "fan_master": [("type", "fan"), ("f", [JUMP])],
        "fan_slave": [("type", "fan"), ("f", [JUMP])],
    })
    # static jump polynomial: constant term only -> update not needed;
    # seed ref_value as the constant (what _up_fan writes at Q=0)
    bcs = tuple(bc.replace(ref_value=JUMP)
                if bc.kind == "fan" else bc for bc in bcs)
    sol = _solve_poisson(mesh, bcs)
    x = np.asarray(mesh.c)[:, 0]
    # p(0)=p(2)=0, rise +J at x=1: p = -J x/2 (x<1), -J (x-2)/2 (x>1)
    ref = np.where(x < 1.0, -JUMP * x / 2.0, -JUMP * (x - 2.0) / 2.0)
    np.testing.assert_allclose(sol, ref, atol=2e-4)
