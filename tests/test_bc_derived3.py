"""Derived boundary conditions, batch 3 (reference:
src/finiteVolume/fields/fvPatchFields/derived/): advective,
uniformFixedGradient, pressure-driven velocity inlets,
fixedShearStress, buoyantPressure, hydrostatic pressure, turbulent
heat flux, barotropic density, timeVaryingMappedFixedValue."""

import os

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


def _normals(mesh, p):
    sf = np.asarray(mesh.sf)[p.slice]
    return sf / np.linalg.norm(sf, axis=1, keepdims=True)


def test_pressure_inlet_uniform_velocity():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "pressureInletUniformVelocity"),
                     ("value", "uniform (0 0 0)")])
    bc = factory.from_dict(spec, p, 1, jnp.float32, mesh=mesh)
    phi = jnp.ones((mesh.n_faces,), jnp.float32) * 0.5
    U = jnp.zeros((mesh.n_cells, 3), jnp.float32)
    bc2 = pf.update(bc, mesh, p, U, phi=phi)
    vf = np.asarray(pf.evaluate(bc2, mesh, p, U))
    # uniform: every face gets the same normal speed
    n = _normals(mesh, p)
    speed = np.sum(vf * n, axis=1)
    assert np.allclose(speed, speed[0], atol=1e-6)
    mag = np.asarray(mesh.mag_sf)[p.slice]
    assert np.isclose(speed[0], 0.5 * p.size / mag.sum(), rtol=1e-5)


def test_pressure_normal_io_velocity_switches():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "pressureNormalInletOutletVelocity"),
                     ("value", "uniform (0 0 0)")])
    bc = factory.from_dict(spec, p, 1, jnp.float32, mesh=mesh)
    U = jnp.ones((mesh.n_cells, 3), jnp.float32)
    # outflow (phi > 0): zeroGradient -> cell value
    phi = jnp.ones((mesh.n_faces,), jnp.float32)
    vf_out = np.asarray(pf.evaluate(
        pf.update(bc, mesh, p, U, phi=phi), mesh, p, U))
    assert np.allclose(vf_out, 1.0, atol=1e-6)
    # inflow (phi < 0): normal velocity from the flux
    vf_in = np.asarray(pf.evaluate(
        pf.update(bc, mesh, p, U, phi=-phi), mesh, p, U))
    n = _normals(mesh, p)
    tang = vf_in - n * np.sum(n * vf_in, axis=1, keepdims=True)
    assert np.allclose(tang, 0.0, atol=1e-5)


def test_fixed_shear_stress():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "fixedShearStress"),
                     ("tau", (0.0, 0.2, 0.0)),
                     ("value", "uniform (0 0 0)")])
    bc = factory.from_dict(spec, p, 1, jnp.float32, mesh=mesh)
    assert bc.opt("tau") == (0.0, 0.2, 0.0)
    U = jnp.zeros((mesh.n_cells, 3), jnp.float32)
    bc2 = pf.update(bc, mesh, p, U, nu=1e-2)
    vf = np.asarray(pf.evaluate(bc2, mesh, p, U))
    dc = np.asarray(mesh.delta_coeffs)[p.slice]
    # zero internal velocity: U_f = tau/(nu dc)
    assert np.allclose(vf[:, 1], 0.2 / (1e-2 * dc), rtol=1e-4)


def test_buoyant_pressure_gradient():
    mesh = _mesh()
    p = _patch(mesh, "fixedWalls")
    spec = FoamDict([("type", "buoyantPressure"),
                     ("value", "uniform 0")])
    bc = factory.from_dict(spec, p, 0, jnp.float32, mesh=mesh)
    rho = jnp.full((mesh.n_cells,), 2.0, jnp.float32)
    pfld = jnp.zeros((mesh.n_cells,), jnp.float32)
    bc2 = pf.update(bc, mesh, p, pfld, rho_b=rho,
                    g=(0.0, -9.81, 0.0))
    n = _normals(mesh, p)
    expect = 2.0 * (n @ np.asarray([0.0, -9.81, 0.0]))
    assert np.allclose(np.asarray(bc2.ref_grad), expect, rtol=1e-5)


def test_uniform_density_hydrostatic_pressure_static():
    mesh = _mesh()
    p = _patch(mesh, "fixedWalls")
    spec = FoamDict([("type", "uniformDensityHydrostaticPressure"),
                     ("rho", 1000.0), ("pRefValue", 101325.0),
                     ("pRefPoint", (0.0, 0.1, 0.0)),
                     ("g", (0.0, -9.81, 0.0))])
    bc = factory.from_dict(spec, p, 0, jnp.float32, mesh=mesh)
    cf = np.asarray(mesh.cf)[p.slice]
    expect = 101325.0 + 1000.0 * (cf - [0.0, 0.1, 0.0]) \
        @ np.asarray([0.0, -9.81, 0.0])
    assert np.allclose(np.asarray(bc.ref_value), expect, rtol=1e-6)


def test_turbulent_heat_flux_temperature():
    mesh = _mesh()
    p = _patch(mesh, "fixedWalls")
    spec = FoamDict([("type", "turbulentHeatFluxTemperature"),
                     ("heatSource", "flux"), ("q", 100.0),
                     ("alphaEff", 1e-3), ("rho", 1.0), ("Cp", 1000.0),
                     ("value", "uniform 300")])
    bc = factory.from_dict(spec, p, 0, jnp.float32, mesh=mesh)
    T = jnp.full((mesh.n_cells,), 300.0, jnp.float32)
    bc2 = pf.update(bc, mesh, p, T)
    # snGrad = q/(rho Cp alphaEff) = 100/(1*1000*1e-3) = 100
    assert np.allclose(np.asarray(bc2.ref_grad), 100.0, rtol=1e-5)


def test_fixed_pressure_compressible_density():
    mesh = _mesh()
    p = _patch(mesh, "fixedWalls")
    spec = FoamDict([("type", "fixedPressureCompressibleDensity"),
                     ("p0", 1e5), ("rho0", 1000.0), ("psi", 1e-5),
                     ("value", "uniform 1000")])
    bc = factory.from_dict(spec, p, 0, jnp.float32, mesh=mesh)
    rho = jnp.full((mesh.n_cells,), 1000.0, jnp.float32)
    pfield = jnp.full((mesh.n_cells,), 2e5, jnp.float32)
    bc2 = pf.update(bc, mesh, p, rho, p_b=pfield)
    # rho = 1000 + 1e-5 (2e5 - 1e5) = 1001
    vf = np.asarray(pf.evaluate(bc2, mesh, p, rho))
    assert np.allclose(vf, 1001.0, rtol=1e-6)


def test_uniform_fixed_gradient_table():
    mesh = _mesh()
    p = _patch(mesh, "fixedWalls")
    spec = parse_string("""
type uniformFixedGradient;
uniformGradient table ((0 0) (1 10));
""")
    bc = factory.from_dict(spec, p, 0, jnp.float32, mesh=mesh)
    assert bc.kind == "uniformFixedGradientT"
    T = jnp.zeros((mesh.n_cells,), jnp.float32)
    bc2 = pf.update(bc, mesh, p, T, t=0.5)
    assert np.allclose(np.asarray(bc2.ref_grad), 5.0, atol=1e-5)


def test_advective_outflow_relaxes_to_field_inf():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "advective"), ("fieldInf", 10.0),
                     ("lInf", 0.1), ("value", "uniform 0")])
    bc = factory.from_dict(spec, p, 0, jnp.float32, mesh=mesh)
    T = jnp.zeros((mesh.n_cells,), jnp.float32)
    phi = jnp.ones((mesh.n_faces,), jnp.float32) * 0.01
    bc2 = bc
    for _ in range(200):
        bc2 = pf.update(bc2, mesh, p, T, phi=phi, dt=0.1)
    vf = np.asarray(pf.evaluate(bc2, mesh, p, T))
    # the advected face value settles between the internal value (0)
    # and fieldInf (10) at the Co/k-weighted fixed point
    assert 0.1 < vf.mean() < 10.0
    # without the lInf relaxation the value stays at the internal 0
    spec0 = FoamDict([("type", "advective"), ("value", "uniform 0")])
    bc0 = factory.from_dict(spec0, p, 0, jnp.float32, mesh=mesh)
    bc0 = pf.update(bc0, mesh, p, T, phi=phi, dt=0.1)
    assert np.allclose(np.asarray(pf.evaluate(bc0, mesh, p, T)), 0.0,
                       atol=1e-6)


def test_time_varying_mapped_fixed_value(tmp_path):
    # build a case skeleton with boundaryData for the movingWall patch
    mesh = _mesh()
    p = _patch(mesh)
    cf = np.asarray(mesh.cf)[p.slice]
    bd = tmp_path / "constant" / "boundaryData" / "movingWall"
    for tname, scale in (("0", 1.0), ("2", 3.0)):
        d = bd / tname
        d.mkdir(parents=True, exist_ok=True)
        vals = "(" + " ".join(f"({scale} 0 0)" for _ in range(p.size)) + ")"
        (d / "U").write_text(f"{p.size}\n{vals}\n")
    pts = "(" + " ".join(f"({x} {y} {z})" for x, y, z in cf) + ")"
    (bd / "points").write_text(f"{p.size}\n{pts}\n")

    spec = FoamDict([("type", "timeVaryingMappedFixedValue"),
                     ("fieldTableName", "U"),
                     ("value", "uniform (0 0 0)")])
    bc = factory.from_dict(spec, p, 1, jnp.float32, mesh=mesh,
                           case_dir=str(tmp_path), field_name="U")
    assert bc.kind == "timeVaryingMappedFixedValue"
    U = jnp.zeros((mesh.n_cells, 3), jnp.float32)
    # t=1: halfway between scale 1 and scale 3 -> 2
    bc2 = pf.update(bc, mesh, p, U, t=1.0)
    vf = np.asarray(pf.evaluate(bc2, mesh, p, U))
    assert np.allclose(vf[:, 0], 2.0, atol=1e-5)
    # clamped before the first snapshot
    bc3 = pf.update(bc, mesh, p, U, t=-5.0)
    vf3 = np.asarray(pf.evaluate(bc3, mesh, p, U))
    assert np.allclose(vf3[:, 0], 1.0, atol=1e-5)
