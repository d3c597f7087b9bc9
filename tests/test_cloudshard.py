"""Sharded Lagrangian cloud (parallel/cloudshard.py; reference:
src/lagrangian/basic/Cloud/ processor transfer — VERDICT r4 missing #5).

Oracle: on the 8-virtual-device mesh, the owner-shard cloud with
bucketed all_to_all transfer reproduces the UNSHARDED evolve()
trajectories exactly (same drag/track arithmetic, only the residence
changes), particles migrate between shards, and overflow counters stay
zero."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.core.dictionary import parse_string
from foamtpu.lagrangian import (Cloud, CloudConfig, evolve,
                                face_boundary_types, make_cloud)
from foamtpu.mesh import blockmesh, to_device
from foamtpu.parallel import cloudshard, gspmd

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _duct():
    d = parse_string("""
vertices (
    (0 0 0) (4 0 0) (4 1 0) (0 1 0)
    (0 0 0.2) (4 0 0.2) (4 1 0.2) (0 1 0.2)
);
blocks ( hex (0 1 2 3 4 5 6 7) (32 8 1) simpleGrading (1 1 1) );
boundary (
    inlet  { type patch; faces ((0 4 7 3)); }
    outlet { type patch; faces ((2 6 5 1)); }
    walls  { type wall; faces ((3 7 6 2) (1 5 4 0)); }
    frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
""")
    return to_device(blockmesh.generate(d))


def _setup(n_particles=40, seed=0):
    mesh = _duct()
    rng = np.random.default_rng(seed)
    x0 = np.stack([rng.uniform(0.2, 1.0, n_particles),
                   rng.uniform(0.2, 0.8, n_particles),
                   np.full(n_particles, 0.1)], axis=1)
    cloud = make_cloud(mesh, x0, u=[0.0, 0.0, 0.0], d=50e-6, rho=1000.0,
                       n_slots=n_particles)
    bt = face_boundary_types(mesh)
    cfg = CloudConfig(rho_f=1.2, mu_f=1.8e-5, g=(0.0, -9.81, 0.0),
                      max_hops=8)
    # uniform carrier wind down the duct
    U_cell = jnp.broadcast_to(jnp.asarray([2.0, 0.0, 0.0],
                                          mesh.v.dtype),
                              (mesh.n_cells, 3))
    return mesh, cloud, bt, cfg, U_cell


def test_sharded_matches_unsharded():
    mesh, cloud, bt, cfg, U_cell = _setup()
    jmesh = gspmd.space_mesh(8)
    assert mesh.n_cells % 8 == 0
    dt = jnp.asarray(5e-3, mesh.v.dtype)

    # unsharded reference trajectories
    ref = cloud
    step_ref = jax.jit(lambda c: evolve(mesh, c, U_cell, dt, jnp.asarray(bt),
                                        cfg))
    for _ in range(20):
        ref = step_ref(ref)

    leaves, S = cloudshard.shard_cloud(cloud, 8, mesh.n_cells)
    leaves = cloudshard.place(leaves, jmesh)
    U_sh = jax.device_put(
        U_cell, jax.sharding.NamedSharding(
            jmesh, jax.sharding.PartitionSpec("space", None)))
    step = cloudshard.make_sharded_evolve(mesh, bt, cfg, jmesh, S)
    step_j = jax.jit(step)
    diag = None
    for _ in range(20):
        leaves, diag = step_j(leaves, U_sh, dt)
    assert int(jnp.sum(diag["overflow_send"])) == 0
    assert int(jnp.sum(diag["overflow_recv"])) == 0

    got = cloudshard.gather_cloud(leaves)
    ref_active = np.asarray(ref.active)
    ref_pid = np.arange(ref.x.shape[0])[ref_active]
    assert got["pid"].shape[0] == ref_pid.shape[0], \
        "sharded run lost/created particles"
    np.testing.assert_array_equal(got["pid"], ref_pid)
    np.testing.assert_allclose(got["x"], np.asarray(ref.x)[ref_active],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got["u"], np.asarray(ref.u)[ref_active],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(got["cell"],
                                  np.asarray(ref.cell)[ref_active])


def test_particles_actually_migrate():
    """The wind pushes every parcel down the duct: shard occupancy must
    change over time (i.e. the all_to_all transfer is really moving
    particles, not just the invariant holding trivially)."""
    mesh, cloud, bt, cfg, U_cell = _setup()
    jmesh = gspmd.space_mesh(8)
    dt = jnp.asarray(5e-3, mesh.v.dtype)
    leaves, S = cloudshard.shard_cloud(cloud, 8, mesh.n_cells)
    leaves = cloudshard.place(leaves, jmesh)
    U_sh = jax.device_put(
        U_cell, jax.sharding.NamedSharding(
            jmesh, jax.sharding.PartitionSpec("space", None)))
    step = jax.jit(cloudshard.make_sharded_evolve(mesh, bt, cfg, jmesh, S))

    def occupancy(lv):
        act = np.asarray(lv["active"]).reshape(8, S)
        return act.sum(axis=1)

    occ0 = occupancy(leaves)
    nc_loc = mesh.n_cells // 8
    for _ in range(25):
        leaves, diag = step(leaves, U_sh, dt)
        # residence invariant after every step
        cell = np.asarray(leaves["cell"]).reshape(8, S)
        act = np.asarray(leaves["active"]).reshape(8, S)
        for s in range(8):
            own = cell[s][act[s]] // nc_loc
            assert (own == s).all(), "residence invariant violated"
    occ1 = occupancy(leaves)
    assert occ0.sum() == occ1.sum() == 40    # duct walls: nothing escapes yet
    assert (occ0 != occ1).any(), "no particle ever changed shard"


def test_overflow_reported_not_dropped_silently():
    """With a tiny transfer capacity the overflow counter must fire."""
    mesh, cloud, bt, cfg, U_cell = _setup(n_particles=30)
    jmesh = gspmd.space_mesh(8)
    dt = jnp.asarray(2e-2, mesh.v.dtype)  # big dt: many cross at once
    leaves, S = cloudshard.shard_cloud(cloud, 8, mesh.n_cells)
    leaves = cloudshard.place(leaves, jmesh)
    U_sh = jax.device_put(
        U_cell, jax.sharding.NamedSharding(
            jmesh, jax.sharding.PartitionSpec("space", None)))
    step = jax.jit(cloudshard.make_sharded_evolve(mesh, bt, cfg, jmesh, S,
                                                  cap=1))
    fired = 0
    for _ in range(12):
        leaves, diag = step(leaves, U_sh, dt)
        fired += int(jnp.sum(diag["overflow_send"]))
    assert fired > 0, "cap=1 never overflowed — counter is dead"
