"""Utility-layer tests: foamLog parsing, transport models,
function-object math, partitioner."""

import numpy as np

import jax.numpy as jnp


def test_foamlog_roundtrip(tmp_path):
    from foamtpu.utils import foamlog

    log = """
Time = 0.005

Courant Number mean: 0.1 max: 0.85
Solving for Ux, Initial residual = 1, Final residual = 9.7e-06, No Iterations 12
Solving for p, Initial residual = 1, Final residual = 8.2e-07, No Iterations 35
Solving for p, Initial residual = 0.02, Final residual = 6e-07, No Iterations 20
time step continuity errors : sum local = 1.2e-08, global = -3e-10, cumulative = -3e-10

Time = 0.01

Courant Number mean: 0.11 max: 0.9
Solving for Ux, Initial residual = 0.4, Final residual = 5e-06, No Iterations 10
Solving for p, Initial residual = 0.5, Final residual = 7e-07, No Iterations 30
"""
    series = foamlog.parse(log)
    assert series["Ux"] == [(0.005, 1.0), (0.01, 0.4)]
    assert series["p"][1] == (0.01, 0.5)
    assert series["p_1"] == [(0.005, 0.02)]  # second p solve in the step
    assert series["CourantMax"] == [(0.005, 0.85), (0.01, 0.9)]
    p = tmp_path / "log.icoFoam"
    p.write_text(log)
    out = foamlog.write_logs(str(p))
    import os

    assert os.path.exists(os.path.join(out, "p"))


def test_transport_models():
    from foamtpu.core.dictionary import parse_string
    from foamtpu.core.fields import vol_vector
    from foamtpu.mesh import to_device
    from foamtpu.models import transport

    from test_blockmesh import cavity_mesh

    mesh = to_device(cavity_mesh(6))
    # shear field: u = (y, 0, 0)
    c = np.asarray(mesh.c)
    U = vol_vector(mesh, jnp.zeros(3)).with_data(
        jnp.asarray(np.stack([c[:, 1], 0 * c[:, 1], 0 * c[:, 1]], 1),
                    mesh.v.dtype))

    d = parse_string("""
transportModel  powerLaw;
powerLawCoeffs { k k [0 2 -1 0 0 0 0] 1e-3; n n [0 0 0 0 0 0 0] 0.6;
                 nuMin nuMin [0 2 -1 0 0 0 0] 1e-6;
                 nuMax nuMax [0 2 -1 0 0 0 0] 1e-2; }
""")
    nu = transport.select(d)(mesh, U)
    arr = np.asarray(nu)
    assert (arr >= 1e-6 - 1e-12).all() and (arr <= 1e-2 + 1e-12).all()
    # shear-thinning: nu finite and below nuMax for shear rate ~1
    assert np.isfinite(arr).all()

    d2 = parse_string("transportModel Newtonian; nu nu [0 2 -1 0 0 0 0] 0.01;")
    nu2 = np.asarray(transport.select(d2)(mesh, U))
    np.testing.assert_allclose(nu2, 0.01)


def test_vorticity_q():
    from foamtpu.core.fields import vol_vector
    from foamtpu.functionobjects.field import q_criterion, vorticity
    from foamtpu.mesh import to_device

    from test_blockmesh import cavity_mesh

    mesh = to_device(cavity_mesh(8))
    # rigid rotation u = (-y, x, 0): vorticity = (0,0,2), Q > 0
    c = np.asarray(mesh.c) - np.array([0.05, 0.05, 0.005])
    U = vol_vector(mesh, jnp.zeros(3)).with_data(
        jnp.asarray(np.stack([-c[:, 1], c[:, 0], 0 * c[:, 0]], 1),
                    mesh.v.dtype))
    w = np.asarray(vorticity(mesh, U))
    # interior cells: boundary zero-gradient pollutes the rim
    interior = (np.abs(c[:, 0]) < 0.03) & (np.abs(c[:, 1]) < 0.03)
    np.testing.assert_allclose(w[interior, 2], 2.0, atol=0.05)
    q = np.asarray(q_criterion(mesh, U))
    assert (q[interior] > 0).all()


def test_partitioner():
    from foamtpu.mesh import to_device
    from foamtpu.parallel import partition

    from test_blockmesh import cavity_mesh

    poly = cavity_mesh(16)
    parts = partition.decompose(poly, 4)
    counts = np.bincount(parts, minlength=4)
    assert counts.min() >= 60 and counts.max() <= 68  # balanced
    cut = partition.cut_faces(poly, parts)
    assert cut <= 3 * 16  # compact partitions, not random
