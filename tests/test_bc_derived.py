"""Derived boundary conditions added in round 3 (reference:
src/finiteVolume/fields/fvPatchFields/derived/)."""

import jax.numpy as jnp
import numpy as np

from foamtpu.apps.cases import CAVITY_BLOCKMESH
from foamtpu.bc import factory, patchfields as pf
from foamtpu.core.dictionary import FoamDict, parse_string
from foamtpu.mesh import blockmesh, to_device


def _mesh():
    return to_device(blockmesh.generate(
        parse_string(CAVITY_BLOCKMESH.replace("{n}", "8"))))


def _patch(mesh, name="movingWall"):
    return mesh.patch(name)


def test_rotating_wall_velocity_factory():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "rotatingWallVelocity"),
                     ("origin", (0.05, 0.05, 0.0)),
                     ("axis", (0.0, 0.0, 1.0)),
                     ("omega", 10.0)])
    bc = factory.from_dict(spec, p, rank=1, dtype=jnp.float32, mesh=mesh)
    assert bc.kind == "fixedValue"
    cf = np.asarray(mesh.cf)[p.slice]
    u = np.asarray(bc.ref_value)
    expect = np.cross([0, 0, 10.0], cf - [0.05, 0.05, 0.0])
    assert np.allclose(u, expect, atol=1e-6)


def test_pressure_inlet_velocity_update():
    mesh = _mesh()
    p = _patch(mesh)
    bc = pf.make("pressureInletVelocity", ref_value=jnp.zeros(3), vfrac=1.0)
    phi = jnp.ones(mesh.n_faces) * 2.0
    U = jnp.zeros((mesh.n_cells, 3))
    bc2 = pf.update(bc, mesh, p, U, phi=phi)
    n = np.asarray(mesh.sf[p.slice]) / np.asarray(
        mesh.mag_sf[p.slice])[:, None]
    expect = (2.0 / np.asarray(mesh.mag_sf[p.slice]))[:, None] * n
    assert np.allclose(np.asarray(bc2.ref_value), expect, atol=1e-6)


def test_variable_height_flow_rate_clamps():
    mesh = _mesh()
    p = _patch(mesh)
    bc = pf.make("variableHeightFlowRate", vfrac=0.0,
                 lowerBound=0.0, upperBound=1.0)
    a = jnp.zeros(mesh.n_cells)
    own = np.asarray(mesh.owner[p.slice])
    a = a.at[own[0]].set(-0.2)     # below: clamp to 0 (fixedValue)
    a = a.at[own[1]].set(1.4)      # above: clamp to 1
    a = a.at[own[2]].set(0.5)      # inside: zeroGradient
    bc2 = pf.update(bc, mesh, p, a)
    f = np.asarray(bc2.vfrac)
    rv = np.asarray(bc2.ref_value)
    assert f[0] == 1.0 and rv[0] == 0.0
    assert f[1] == 1.0 and rv[1] == 1.0
    assert f[2] == 0.0
    # face value honours the clamp
    v = pf.evaluate(bc2, mesh, p, a)
    assert abs(float(v[0]) - 0.0) < 1e-6
    assert abs(float(v[1]) - 1.0) < 1e-6
    assert abs(float(v[2]) - 0.5) < 1e-6


def test_wave_transmissive_relaxes_to_upstream():
    """With large outgoing Courant the face value follows the interior
    (transmits); with lInf it relaxes toward fieldInf."""
    mesh = _mesh()
    p = _patch(mesh)
    bc = pf.make("waveTransmissive", ref_value=jnp.zeros(p.size),
                 vfrac=0.0, fieldInf=1e5, lInf=0.0)
    T = jnp.full(mesh.n_cells, 2.0)
    phi = jnp.full(mesh.n_faces, 10.0)
    c = jnp.full(mesh.n_faces, 300.0)
    bc2 = pf.update(bc, mesh, p, T, phi=phi, dt=jnp.asarray(1.0),
                    c_sound=c)
    # Co >> 1 -> v_new ~ v_cell = 2
    v = np.asarray(bc2.ref_value)
    assert np.allclose(v, 2.0, atol=0.05)
    bc3 = pf.make("waveTransmissive", ref_value=jnp.zeros(p.size),
                  vfrac=0.0, fieldInf=5.0, lInf=1e-4)
    bc3 = pf.update(bc3, mesh, p, T, phi=phi, dt=jnp.asarray(1.0),
                    c_sound=c)
    # k >> Co -> v_new ~ fieldInf
    assert np.allclose(np.asarray(bc3.ref_value), 5.0, atol=0.1)


def test_fixed_flux_pressure_parse_and_update():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "fixedFluxPressure")])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32, mesh=mesh)
    assert bc.kind == "fixedFluxPressure"
    # behaves as zeroGradient by default
    x = jnp.arange(mesh.n_cells, dtype=jnp.float32)
    v = pf.evaluate(bc, mesh, p, x)
    own = np.asarray(mesh.owner[p.slice])
    assert np.allclose(np.asarray(v), np.asarray(x)[own], atol=1e-6)
    # solver-supplied snGrad is honoured
    sg = jnp.ones(mesh.n_faces - mesh.n_internal_faces)
    sg_full = jnp.zeros(mesh.n_faces).at[mesh.n_internal_faces:].set(1.0)
    bc2 = pf.update(bc, mesh, p, x, snGradP=sg_full)
    dc = np.asarray(mesh.delta_coeffs[p.slice])
    v2 = pf.evaluate(bc2, mesh, p, x)
    assert np.allclose(np.asarray(v2), np.asarray(x)[own] + 1.0 / dc,
                       atol=1e-5)


def test_supersonic_freestream_switches():
    mesh = _mesh()
    p = _patch(mesh)
    bc = pf.make("supersonicFreestream", ref_value=3.0, vfrac=0.0)
    T = jnp.zeros(mesh.n_cells)
    phi = jnp.zeros(mesh.n_faces).at[p.start].set(-1.0)  # inflow on face 0
    bc2 = pf.update(bc, mesh, p, T, phi=phi)
    f = np.asarray(bc2.vfrac)
    assert f[0] == 1.0 and (f[1:] == 0.0).all()


def test_cylindrical_inlet_velocity_factory():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "cylindricalInletVelocity"),
                     ("centre", (0.05, 0.05, 0.0)),
                     ("axis", (0.0, 0.0, 1.0)),
                     ("axialVelocity", 2.0),
                     ("radialVelocity", 0.5),
                     ("rpm", 60.0)])
    bc = factory.from_dict(spec, p, rank=1, dtype=jnp.float32,
                           mesh=mesh)
    assert bc.kind == "fixedValue"
    cf = np.asarray(mesh.cf)[p.slice]
    d = cf - [0.05, 0.05, 0.0]
    d[:, 2] = 0.0
    rhat = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True),
                          1e-30)
    expect = (2.0 * np.array([0, 0, 1.0])[None, :] + 0.5 * rhat
              + 2.0 * np.pi * np.cross([0, 0, 1.0], d))
    assert np.allclose(np.asarray(bc.ref_value), expect, atol=1e-5)


def test_swirl_flow_rate_inlet_velocity_factory():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "swirlFlowRateInletVelocity"),
                     ("origin", (0.05, 0.05, 0.0)),
                     ("axis", (0.0, 0.0, 1.0)),
                     ("flowRate", 0.002),
                     ("rpm", 0.0)])
    bc = factory.from_dict(spec, p, rank=1, dtype=jnp.float32,
                           mesh=mesh)
    # flux through the patch must equal -flowRate (inward)
    sf = np.asarray(mesh.sf)[p.slice]
    q = float((np.asarray(bc.ref_value) * sf).sum())
    assert abs(q + 0.002) < 1e-8


def test_uniform_fixed_value_table():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "uniformFixedValue"),
                     ("uniformValue",
                      ["table", np.asarray([[0.0, 3.5], [1.0, 7.0]])])])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32,
                           mesh=mesh)
    # tables now resolve to the DYNAMIC kind (re-sampled from solver
    # time via the update rule; see tests/test_bc_derived2.py)
    assert bc.kind == "uniformFixedValueT"
    assert np.allclose(np.asarray(bc.ref_value), 3.5)


def test_external_wall_heat_flux_modes():
    mesh = _mesh()
    p = _patch(mesh)
    # q-mode: fixedGradient q/kappa
    spec = FoamDict([("type", "externalWallHeatFluxTemperature"),
                     ("q", 1000.0), ("kappaValue", 10.0)])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32,
                           mesh=mesh)
    assert bc.kind == "fixedGradient"
    assert abs(float(np.asarray(bc.ref_grad)) - 100.0) < 1e-8
    # h-mode: Robin; f -> 1 as h -> inf, -> 0 as h -> 0
    spec_h = FoamDict([("type", "externalWallHeatFluxTemperature"),
                       ("h", 1e9), ("Ta", 350.0),
                       ("kappaValue", 1.0)])
    bc_h = factory.from_dict(spec_h, p, rank=0, dtype=jnp.float32,
                             mesh=mesh)
    assert bc_h.kind == "mixed"
    assert np.asarray(bc_h.vfrac).min() > 0.999
    assert abs(float(np.asarray(bc_h.ref_value)) - 350.0) < 1e-8


def test_pressure_directed_inlet_velocity_update():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "pressureDirectedInletVelocity"),
                     ("inletDirection", [(0.0, -1.0, 0.0)])])
    bc = factory.from_dict(spec, p, rank=1, dtype=jnp.float32,
                           mesh=mesh)
    assert bc.kind == "pressureDirectedInletVelocity"
    phi = jnp.full(mesh.n_faces, -0.004)
    U = jnp.zeros((mesh.n_cells, 3))
    bc2 = pf.update(bc, mesh, p, U, phi=phi)
    u = np.asarray(bc2.ref_value)
    # movingWall is the y=max wall: Sf ~ (0, +A, 0); d = (0,-1,0):
    # U = d*phi/(Sf.d) = (0,-1,0)*(-0.004)/(-A) -> Uy negative inflow
    sfy = np.asarray(mesh.sf)[p.slice][:, 1]
    expect_uy = -(-0.004) / (-sfy)
    assert np.allclose(u[:, 1], expect_uy, rtol=1e-5)
    assert np.allclose(u[:, [0, 2]], 0.0, atol=1e-7)
    # face flux reproduced: (U . Sf) == phi
    rec = (u * np.asarray(mesh.sf)[p.slice]).sum(axis=1)
    assert np.allclose(rec, -0.004, rtol=1e-5)


def test_flux_corrected_and_total_temperature_aliases():
    mesh = _mesh()
    p = _patch(mesh)
    bc = factory.from_dict(FoamDict([("type", "fluxCorrectedVelocity")]),
                           p, rank=1, dtype=jnp.float32, mesh=mesh)
    assert bc.kind == "pressureInletOutletVelocity"
    bc2 = factory.from_dict(
        FoamDict([("type", "totalTemperature"),
                  ("T0", ["uniform", 400.0])]),
        p, rank=0, dtype=jnp.float32, mesh=mesh)
    assert bc2.kind == "fixedValue"
    assert np.allclose(np.asarray(bc2.ref_value), 400.0)
