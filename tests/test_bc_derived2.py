"""Derived boundary conditions, batch 2 (reference:
src/finiteVolume/fields/fvPatchFields/derived/ + RAS wall functions)."""

import jax.numpy as jnp
import numpy as np

import foamtpu.models.turbulence.ras  # noqa: F401 (wall-fn updates)
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


def test_partial_slip_blend():
    mesh = _mesh()
    p = _patch(mesh)
    bc = pf.make("partialSlip", vfrac=0.25)
    U = jnp.asarray(np.random.default_rng(0).standard_normal(
        (mesh.n_cells, 3)), jnp.float32)
    vf = pf.evaluate(bc, mesh, p, U)
    n = _normals(mesh, p)
    vi = np.asarray(U)[np.asarray(mesh.owner[p.slice])]
    tang = vi - n * np.sum(n * vi, axis=1, keepdims=True)
    assert np.allclose(np.asarray(vf), 0.75 * tang, atol=1e-5)


def test_fixed_normal_slip():
    mesh = _mesh()
    p = _patch(mesh)
    rv = jnp.asarray([0.0, 2.0, 0.0])
    bc = pf.make("fixedNormalSlip", ref_value=rv)
    U = jnp.asarray(np.random.default_rng(1).standard_normal(
        (mesh.n_cells, 3)), jnp.float32)
    vf = np.asarray(pf.evaluate(bc, mesh, p, U))
    n = _normals(mesh, p)
    # normal component equals n (n.rv); tangential equals cell tangential
    vn = np.sum(n * vf, axis=1)
    expect_n = np.sum(n * np.asarray([0.0, 2.0, 0.0]), axis=1)
    assert np.allclose(vn, expect_n, atol=1e-5)


def test_translating_wall_velocity_factory():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "translatingWallVelocity"),
                     ("U", (1.0, 2.0, 3.0))])
    bc = factory.from_dict(spec, p, rank=1, dtype=jnp.float32, mesh=mesh)
    assert bc.kind == "fixedValue"
    n = _normals(mesh, p)
    u = np.asarray(bc.ref_value)
    assert np.allclose(np.sum(n * u, axis=1), 0.0, atol=1e-5)


def test_inlet_outlet_total_temperature():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "inletOutletTotalTemperature"),
                     ("T0", ["uniform", 400.0]), ("Cp", 1000.0)])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32, mesh=mesh)
    T = jnp.full(mesh.n_cells, 300.0)
    U = jnp.zeros((mesh.n_cells, 3)).at[:, 0].set(10.0)
    phi = -jnp.ones(mesh.n_faces)  # inflow everywhere
    bc2 = pf.update(bc, mesh, p, T, phi=phi, U=U)
    # T = T0 - |U|^2/(2 Cp) = 400 - 100/2000 = 399.95
    assert np.allclose(np.asarray(bc2.ref_value), 399.95, atol=1e-3)
    assert np.allclose(np.asarray(bc2.vfrac), 1.0)
    phi_out = jnp.ones(mesh.n_faces)
    bc3 = pf.update(bc, mesh, p, T, phi=phi_out, U=U)
    assert np.allclose(np.asarray(bc3.vfrac), 0.0)  # zeroGradient


def test_outlet_mapped_uniform_inlet():
    mesh = _mesh()
    inlet = _patch(mesh, "movingWall")
    outlet = _patch(mesh, "fixedWalls")
    spec = FoamDict([("type", "outletMappedUniformInlet"),
                     ("outletPatchName", "fixedWalls"),
                     ("fraction", 0.5)])
    bc = factory.from_dict(spec, inlet, rank=0, dtype=jnp.float32,
                           mesh=mesh)
    T = jnp.full(mesh.n_cells, 7.0)
    bc2 = pf.update(bc, mesh, inlet, T)
    assert np.allclose(np.asarray(bc2.ref_value), 3.5, atol=1e-5)


def test_turbulent_inlet_bounded_noise():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "turbulentInlet"),
                     ("referenceField",
                      ["uniform", np.asarray([10.0, 0.0, 0.0])]),
                     ("fluctuationScale", (0.1, 0.0, 0.0))])
    bc = factory.from_dict(spec, p, rank=1, dtype=jnp.float32, mesh=mesh)
    U = jnp.zeros((mesh.n_cells, 3))
    bc2 = pf.update(bc, mesh, p, U, t=0.37)
    u = np.asarray(bc2.ref_value)
    assert np.all(np.abs(u[:, 0] - 10.0) <= 0.5 + 1e-6)
    assert np.allclose(u[:, 1:], 0.0)
    bc3 = pf.update(bc, mesh, p, U, t=0.62)
    assert not np.allclose(np.asarray(bc3.ref_value), u)


def test_atm_boundary_layer_profiles():
    mesh = _mesh()
    p = _patch(mesh, "fixedWalls")
    spec = FoamDict([("type", "atmBoundaryLayerInletVelocity"),
                     ("Uref", 10.0), ("Href", 20.0), ("z0", 0.1),
                     ("flowDir", (1.0, 0.0, 0.0)),
                     ("zDir", (0.0, 1.0, 0.0)), ("zGround", 0.0)])
    bc = factory.from_dict(spec, p, rank=1, dtype=jnp.float32, mesh=mesh)
    u = np.asarray(bc.ref_value)
    z = np.asarray(mesh.cf)[p.slice][:, 1]
    ustar = 0.41 * 10.0 / np.log(20.1 / 0.1)
    expect = ustar / 0.41 * np.log((z + 0.1) / 0.1)
    assert np.allclose(u[:, 0], expect, rtol=1e-4, atol=1e-5)
    spec_e = FoamDict([("type", "atmBoundaryLayerInletEpsilon"),
                       ("Uref", 10.0), ("Href", 20.0), ("z0", 0.1),
                       ("zDir", (0.0, 1.0, 0.0))])
    bce = factory.from_dict(spec_e, p, rank=0, dtype=jnp.float32,
                            mesh=mesh)
    eps = np.asarray(bce.ref_value)
    assert np.allclose(eps, ustar ** 3 / (0.41 * (z + 0.1)), rtol=1e-4)


def test_nut_spalding_matches_log_layer():
    mesh = _mesh()
    p = _patch(mesh)
    bc = pf.make("nutUSpaldingWallFunction", ref_value=0.0, vfrac=1.0)
    nu = 1e-5
    # choose a cell velocity giving y+ ~ 100 (log layer)
    y = float(1.0 / np.asarray(mesh.delta_coeffs)[p.slice][0])
    utau_t = 100.0 * nu / y
    upl = np.log(9.8 * 100.0) / 0.41
    magU = utau_t * upl
    U = jnp.zeros((mesh.n_cells, 3)).at[:, 0].set(magU)
    bc2 = pf.update(bc, mesh, p, U, U=U.astype(jnp.float32), nu=nu)
    nutw = np.asarray(bc2.ref_value)
    # log-layer identity: nut_w ~ utau^2 y / magU - nu
    expect = utau_t ** 2 * y / magU - nu
    assert np.allclose(nutw, expect, rtol=0.05)


def test_nutk_rough_reduces_to_smooth():
    mesh = _mesh()
    p = _patch(mesh)
    nu = 1e-5
    k = jnp.full(mesh.n_cells, 0.01)
    smooth = pf.update(pf.make("nutkWallFunction", ref_value=0.0,
                               vfrac=1.0), mesh, p, k, k=k, nu=nu)
    spec = FoamDict([("type", "nutkRoughWallFunction"),
                     ("Ks", 0.0), ("Cs", 0.5)])
    rough0 = factory.from_dict(spec, p, rank=0, dtype=jnp.float32,
                               mesh=mesh)
    rough0 = pf.update(rough0, mesh, p, k, k=k, nu=nu)
    assert np.allclose(np.asarray(rough0.ref_value),
                       np.asarray(smooth.ref_value), rtol=1e-4)
    specr = FoamDict([("type", "nutkRoughWallFunction"),
                      ("Ks", 0.01), ("Cs", 0.5)])
    rough = factory.from_dict(specr, p, rank=0, dtype=jnp.float32,
                              mesh=mesh)
    rough = pf.update(rough, mesh, p, k, k=k, nu=nu)
    # roughness increases wall nut
    assert np.all(np.asarray(rough.ref_value)
                  >= np.asarray(rough0.ref_value) - 1e-8)
    assert np.any(np.asarray(rough.ref_value)
                  > np.asarray(rough0.ref_value))


def test_rotating_total_pressure_factory():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "rotatingTotalPressure"),
                     ("p0", ["uniform", 10.0]),
                     ("origin", (0.05, 0.05, 0.0)),
                     ("axis", (0.0, 0.0, 1.0)), ("omega", 5.0)])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32, mesh=mesh)
    cf = np.asarray(mesh.cf)[p.slice]
    omxr = np.cross([0, 0, 5.0], cf - [0.05, 0.05, 0.0])
    expect = 10.0 - 0.5 * np.sum(omxr ** 2, axis=1)
    assert np.allclose(np.asarray(bc.ref_grad), expect, atol=1e-5)
    phi = jnp.ones(mesh.n_faces)  # outflow: p = p0_eff
    U = jnp.zeros((mesh.n_cells, 3))
    bc2 = pf.update(bc, mesh, p, jnp.zeros(mesh.n_cells), phi=phi, U=U)
    assert np.allclose(np.asarray(bc2.ref_value), expect, atol=1e-5)


def test_rotating_pio_velocity_inflow_tangential():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "rotatingPressureInletOutletVelocity"),
                     ("origin", (0.05, 0.05, 0.0)),
                     ("axis", (0.0, 0.0, 1.0)), ("omega", 5.0)])
    bc = factory.from_dict(spec, p, rank=1, dtype=jnp.float32, mesh=mesh)
    phi = -2.0 * jnp.ones(mesh.n_faces)
    U = jnp.zeros((mesh.n_cells, 3))
    bc2 = pf.update(bc, mesh, p, U, phi=phi)
    n = _normals(mesh, p)
    u = np.asarray(bc2.ref_value)
    un = np.sum(n * u, axis=1)
    expect_un = -2.0 / np.asarray(mesh.mag_sf)[p.slice]
    assert np.allclose(un, expect_un, rtol=1e-4)
    # tangential part is the frame velocity's tangential projection
    cf = np.asarray(mesh.cf)[p.slice]
    omxr = -np.cross([0, 0, 5.0], cf - [0.05, 0.05, 0.0])
    tang = omxr - n * np.sum(n * omxr, axis=1, keepdims=True)
    assert np.allclose(u - n * un[:, None], tang, atol=1e-4)


def test_uniform_fixed_value_table_dynamic():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "uniformFixedValue"),
                     ("uniformValue",
                      ["table", np.asarray([[0.0, 1.0], [1.0, 3.0]])])])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32, mesh=mesh)
    assert bc.kind == "uniformFixedValueT"
    T = jnp.zeros(mesh.n_cells)
    bc2 = pf.update(bc, mesh, p, T, t=0.5)
    assert np.allclose(np.asarray(bc2.ref_value), 2.0, atol=1e-5)
    bc3 = pf.update(bc, mesh, p, T, t=5.0)   # clamped at table end
    assert np.allclose(np.asarray(bc3.ref_value), 3.0, atol=1e-5)


def test_oscillating_fixed_value_dynamic():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "oscillatingFixedValue"),
                     ("refValue", ["uniform", 2.0]),
                     ("amplitude", 0.5), ("frequency", 1.0)])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32, mesh=mesh)
    T = jnp.zeros(mesh.n_cells)
    bc2 = pf.update(bc, mesh, p, T, t=0.25)   # sin(pi/2) = 1
    assert np.allclose(np.asarray(bc2.ref_value), 2.0 * 1.5, atol=1e-4)


def test_alphat_jayatilleke_low_p_limit():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "alphatJayatillekeWallFunction"),
                     ("Prt", 0.85), ("Pr", 0.85)])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32, mesh=mesh)
    assert bc.kind == "alphatJayatillekeWallFunction"
    nut = jnp.full(mesh.n_faces, 1e-3)
    a = pf.update(bc, mesh, p, jnp.zeros(mesh.n_cells), nut=nut, nu=1e-5)
    # Pr == Prt -> P = 0 -> alphat = nut/Prt exactly
    assert np.allclose(np.asarray(a.ref_value), 1e-3 / 0.85, rtol=1e-4)


def test_freestream_pressure_maps_to_inlet_outlet():
    mesh = _mesh()
    p = _patch(mesh)
    spec = FoamDict([("type", "freestreamPressure"),
                     ("value", ["uniform", 101325.0])])
    bc = factory.from_dict(spec, p, rank=0, dtype=jnp.float32, mesh=mesh)
    assert bc.kind == "inletOutlet"
