"""Lagrangian cloud tests (reference: src/lagrangian/basic + the
icoUncoupledKinematicParcelFoam solver)."""

import jax
import jax.numpy as jnp
import numpy as np

from foamtpu import lagrangian as lag
from foamtpu.core.dictionary import parse_string
from foamtpu.mesh import blockmesh, to_device

BOX = """
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (1 1 0) (0 1 0)
    (0 0 1) (1 0 1) (1 1 1) (0 1 1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (10 10 10) simpleGrading (1 1 1) );
boundary
(
    outlet { type patch; faces ((2 6 5 1)); }
    walls { type wall; faces ((0 4 7 3) (1 5 4 0) (3 7 6 2)
                              (0 3 2 1) (4 5 6 7)); }
);
"""


def _mesh():
    return to_device(blockmesh.generate(parse_string(BOX)))


def test_ballistic_parabola_and_cell_tracking():
    """No drag: x(t) follows the gravity parabola exactly, and the
    tracked cell always contains the particle."""
    mesh = _mesh()
    bt = jnp.asarray(lag.face_boundary_types(mesh))
    cfg = lag.CloudConfig(drag=False, g=(0.0, -1.0, 0.0))
    cloud = lag.make_cloud(mesh, [[0.15, 0.85, 0.5]], [0.5, 0.0, 0.0],
                           1e-3, 1000.0)
    step = jax.jit(lambda c, d: lag.evolve(mesh, c, jnp.zeros(
        (mesh.n_cells, 3), mesh.v.dtype), d, bt, cfg))
    dt = 0.05
    t = 0.0
    for i in range(10):
        cloud = step(cloud, jnp.asarray(dt, mesh.v.dtype))
        t += dt
        x = np.asarray(cloud.x[0])
        # drag-free semi-implicit Euler: u_y after k steps = -k g dt;
        # position is the discrete sum, compare against it
        k = i + 1
        exact_x = 0.15 + 0.5 * t
        exact_y = 0.85 - 1.0 * dt * dt * k * (k + 1) / 2
        assert abs(x[0] - exact_x) < 1e-5
        assert abs(x[1] - exact_y) < 1e-5
        c = np.asarray(mesh.c)[int(cloud.cell[0])]
        assert np.max(np.abs(x - c)) < 0.051  # inside the cell (dx=0.1)
    assert bool(cloud.active[0])


def test_stokes_settling_terminal_velocity():
    """Heavy particle in still fluid reaches the Stokes terminal
    velocity u_t = (1 - rho_f/rho_p) g tau (small Re)."""
    mesh = _mesh()
    bt = jnp.asarray(lag.face_boundary_types(mesh))
    rho_p, d, mu = 2000.0, 50e-6, 1.8e-5
    cfg = lag.CloudConfig(rho_f=1.2, mu_f=mu, g=(0.0, -9.81, 0.0))
    tau = rho_p * d ** 2 / (18 * mu)
    # terminal velocity WITH the Schiller-Naumann correction: solve
    # u = g_eff*tau / (1 + 0.15 Re(u)^0.687) by fixed point
    g_eff = (1 - 1.2 / rho_p) * 9.81
    ut = g_eff * tau
    for _ in range(50):
        Re = 1.2 * ut * d / mu
        ut = g_eff * tau / (1 + 0.15 * Re ** 0.687)
    cloud = lag.make_cloud(mesh, [[0.5, 0.9, 0.5]], [0.0, 0.0, 0.0],
                           d, rho_p)
    U0 = jnp.zeros((mesh.n_cells, 3), mesh.v.dtype)
    step = jax.jit(lambda c, dt: lag.evolve(mesh, c, U0, dt, bt, cfg))
    for _ in range(60):
        cloud = step(cloud, jnp.asarray(tau / 4, mesh.v.dtype))
    uy = float(cloud.u[0, 1])
    assert abs(-uy - ut) / ut < 0.02, (uy, ut)


def test_advection_escape_at_outlet():
    """Tracers in a uniform carrier flow leave through the outlet patch
    and deactivate."""
    mesh = _mesh()
    bt = jnp.asarray(lag.face_boundary_types(mesh))
    cfg = lag.CloudConfig(rho_f=1.0, mu_f=1e-2, g=(0.0, 0.0, 0.0))
    xs = [[0.1, 0.3, 0.5], [0.1, 0.5, 0.5], [0.1, 0.7, 0.5]]
    cloud = lag.make_cloud(mesh, xs, [1.0, 0.0, 0.0], 1e-5, 1.0)
    U0 = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], mesh.v.dtype),
                  (mesh.n_cells, 1))
    step = jax.jit(lambda c, dt: lag.evolve(mesh, c, U0, dt, bt, cfg))
    for _ in range(15):
        cloud = step(cloud, jnp.asarray(0.08, mesh.v.dtype))
    assert int(cloud.n_active) == 0   # all escaped through x=1


def test_wall_rebound():
    """A drag-free particle aimed at a wall reflects specularly."""
    mesh = _mesh()
    bt = jnp.asarray(lag.face_boundary_types(mesh))
    cfg = lag.CloudConfig(drag=False, g=(0.0, 0.0, 0.0))
    cloud = lag.make_cloud(mesh, [[0.5, 0.2, 0.5]], [0.0, -1.0, 0.0],
                           1e-3, 1000.0)
    U0 = jnp.zeros((mesh.n_cells, 3), mesh.v.dtype)
    step = jax.jit(lambda c, dt: lag.evolve(mesh, c, U0, dt, bt, cfg))
    for _ in range(5):
        cloud = step(cloud, jnp.asarray(0.1, mesh.v.dtype))
    # t=0.5: hit floor at t=0.2, then moving up; y = 0.3
    x = np.asarray(cloud.x[0])
    u = np.asarray(cloud.u[0])
    assert bool(cloud.active[0])
    assert u[1] > 0.99
    assert abs(x[1] - 0.3) < 1e-4


def test_kinematic_parcel_app(tmp_path):
    """icoUncoupledKinematicParcelFoam end-to-end: manualInjection from
    kinematicCloudPositions, frozen carrier flow, cloud output files."""
    import glob
    import os

    case = str(tmp_path / "cloudCase")
    hdr = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'
    for d in ("constant/polyMesh", "system", "0"):
        os.makedirs(os.path.join(case, d), exist_ok=True)

    def w(rel, cls, body):
        with open(os.path.join(case, rel), "w") as f:
            f.write(hdr % (cls, os.path.basename(rel)) + body)

    w("constant/polyMesh/blockMeshDict", "dictionary", """
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0) (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (8 8 8) simpleGrading (1 1 1) );
boundary ( outlet { type patch; faces ((2 6 5 1)); }
           walls { type wall; faces ((0 4 7 3) (1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); } );
""")
    w("system/controlDict", "dictionary", """
application icoUncoupledKinematicParcelFoam;
startFrom startTime; startTime 0; stopAt endTime; endTime 0.5; deltaT 0.01;
writeControl timeStep; writeInterval 25; writeFormat ascii;
""")
    w("system/fvSchemes", "dictionary", """
ddtSchemes { default Euler; } gradSchemes { default Gauss linear; }
divSchemes { default none; } laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; } snGradSchemes { default corrected; }
""")
    w("system/fvSolution", "dictionary", "solvers { }\n")
    w("constant/transportProperties", "dictionary", """
transportModel Newtonian;
nu nu [0 2 -1 0 0 0 0] 1.5e-05;
rhoInf rhoInf [1 -3 0 0 0 0 0] 1.2;
""")
    w("constant/g", "uniformDimensionedVectorField", """
dimensions [0 1 -2 0 0 0 0];
value (0 -2 0);
""")
    w("constant/kinematicCloudProperties", "dictionary", """
constantProperties { rho0 2000; }
subModels
{
    injectionModels
    {
        model1 { type manualInjection;
                 positionsFile "kinematicCloudPositions";
                 U0 (0.5 0 0); d0 500e-6; }
    }
}
""")
    w("constant/kinematicCloudPositions", "vectorField", """
3
(
(0.2 0.8 0.5)
(0.3 0.7 0.4)
(0.25 0.75 0.6)
)
""")
    w("0/U", "volVectorField", """
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0.5 0 0);
boundaryField { outlet { type zeroGradient; }
                walls { type fixedValue; value uniform (0 0 0); } }
""")
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", case]) == 0
    c = run_case(case, max_steps=50)
    cloud = c.final_state["cloud"]
    assert int(cloud.n_active) >= 1
    x = np.asarray(cloud.x)[np.asarray(cloud.active)]
    assert np.isfinite(x).all()
    # parcels moved with the carrier and fell under gravity
    assert x[:, 0].mean() > 0.3
    outs = glob.glob(case + "/*/lagrangian/kinematicCloud/positions")
    assert outs, "cloud output not written"
    txt = open(sorted(outs)[-1]).read()
    assert "(" in txt and "Cloud" in txt


def test_patch_injection_bounded_rate():
    """patchInjection activates floor(rate*dt+carry) dead slots per
    step, cycling candidate positions; the cloud never exceeds its slot
    budget (reference: InjectionModel parcelsToInject)."""
    mesh = _mesh()
    cloud = lag.make_cloud(mesh, np.empty((0, 3)), (0, 0, 0), 1e-4,
                           1000.0, n_slots=40)
    inj = lag.patch_injection(mesh, "walls", u0=(0.0, -0.5, 0.0),
                              d0=2e-4, rho0=800.0, rate=500.0)
    carry = jnp.zeros(())
    counter = jnp.zeros((), jnp.int32)
    dt = 0.01   # 5 parcels/step
    for i in range(5):
        cloud, carry, counter = lag.inject(cloud, inj, carry, counter,
                                           dt)
    assert int(cloud.n_active) == 25
    assert int(counter) == 25
    a = np.asarray(cloud.active)
    d = np.asarray(cloud.d)[a]
    r = np.asarray(cloud.rho)[a]
    assert np.allclose(d, 2e-4) and np.allclose(r, 800.0)
    # slot budget respected even when the rate exceeds free slots
    for i in range(10):
        cloud, carry, counter = lag.inject(cloud, inj, carry, counter,
                                           dt)
    assert int(cloud.n_active) <= 40


def test_two_way_momentum_coupling():
    """Falling parcels drag the carrier with them: with the mom_src
    state hook the fluid in the parcel column gains downward momentum
    vs the uncoupled run, and the exchanged momentum is equal and
    opposite (reference: icoUncoupledKinematicParcelFoam vs the
    coupled parcel solvers)."""
    from foamtpu.bc import patchfields as pf
    from foamtpu.solvers import piso

    mesh = _mesh()
    bt = jnp.asarray(lag.face_boundary_types(mesh))
    cfg_c = lag.CloudConfig(rho_f=1000.0, mu_f=1e-3,
                            g=(0.0, -9.81, 0.0))
    x0 = np.stack([np.full(12, 0.5),
                   np.linspace(0.3, 0.8, 12),
                   np.full(12, 0.5)], axis=1)
    def make():
        return lag.make_cloud(mesh, x0, (0.0, 0.0, 0.0), 2e-3, 8000.0,
                              n_slots=16)

    ubcs, pbcs = [], []
    for p in mesh.patches:
        if p.type == "empty":
            ubcs.append(pf.PatchField(kind="empty", vfrac=0.0))
            pbcs.append(pf.PatchField(kind="empty", vfrac=0.0))
        else:
            ubcs.append(pf.fixed_value(jnp.zeros(3)))
            pbcs.append(pf.zero_gradient())
    from foamtpu.core.dimensions import DimensionSet, dimVelocity
    from foamtpu.core.fields import vol_scalar, vol_vector

    U = vol_vector(mesh, jnp.zeros(3), name="U", dims=dimVelocity,
                   bcs=tuple(ubcs))
    pfld = vol_scalar(mesh, 0.0, name="p",
                      dims=DimensionSet.of(0, 2, -2), bcs=tuple(pbcs))
    pcfg = piso.PisoConfig(nu=1e-6, n_correctors=2)
    n_parcels = 1e4

    def run(coupled):
        cloud = make()
        state = piso.initial_state(mesh, U, pfld)
        state["mom_src"] = jnp.zeros((mesh.n_cells, 3), mesh.v.dtype)
        step = jax.jit(lambda s, d: piso.piso_step(mesh, s, d, pcfg))
        dt = jnp.asarray(1e-3, mesh.v.dtype)
        for _ in range(15):
            before = cloud
            cloud = lag.evolve(mesh, cloud, state["U"].data, dt, bt,
                               cfg_c)
            src = lag.momentum_source(mesh, before, cloud, n_parcels,
                                      dt, cfg_c) / cfg_c.rho_f
            state["mom_src"] = src if coupled else 0.0 * src
            state, diag = step(state, dt)
        return cloud, state

    cloud_c, st_c = run(True)
    cloud_u, st_u = run(False)
    uy_c = float(np.asarray(st_c["U"].data)[:, 1].min())
    uy_u = float(np.asarray(st_u["U"].data)[:, 1].min())
    # coupled carrier is dragged down where parcels fall
    assert uy_c < uy_u - 1e-4
    assert np.isfinite(np.asarray(st_c["U"].data)).all()
    # and the parcels fall SLOWER in the coupled run (momentum given up
    # shows up as reduced relative slip is not guaranteed; instead
    # check sign consistency: source points downward net)
    # re-derive one exchange step for sign:
    before = cloud_u
    after = lag.evolve(mesh, cloud_u, st_u["U"].data,
                       jnp.asarray(1e-3, mesh.v.dtype), bt, cfg_c)
    src = lag.momentum_source(mesh, before, after, n_parcels,
                              jnp.asarray(1e-3, mesh.v.dtype), cfg_c)
    assert float(np.asarray(src)[:, 1].sum()) < 0.0


def test_thermo_parcel_ranz_marshall():
    """A hot parcel in still cold fluid relaxes toward the fluid
    temperature with the Ranz-Marshall (Nu=2 quiescent) time constant
    tau = rho_p cp_p d^2 / (12 k_f)."""
    mesh = _mesh()
    bt = jnp.asarray(lag.face_boundary_types(mesh))
    cfg = lag.CloudConfig(rho_f=1.2, mu_f=1.8e-5, g=(0.0, 0.0, 0.0),
                          drag=False, solve_T=True, cp_p=1000.0,
                          k_f=0.026)
    cloud = lag.make_cloud(mesh, [[0.5, 0.5, 0.5]], (0, 0, 0),
                           1e-3, 2000.0, T0=400.0)
    Tf = jnp.full(mesh.n_cells, 300.0)
    Uf = jnp.zeros((mesh.n_cells, 3))
    tau = 2000.0 * 1000.0 * (1e-3) ** 2 / (12.0 * 0.026)
    dt = jnp.asarray(tau / 50.0, mesh.v.dtype)
    for _ in range(50):   # one time constant
        cloud = lag.evolve(mesh, cloud, Uf, dt, bt, cfg, T_cell=Tf)
    T = float(np.asarray(cloud.T)[0])
    expect = 300.0 + 100.0 * np.exp(-1.0)
    assert abs(T - expect) < 2.5, (T, expect)
