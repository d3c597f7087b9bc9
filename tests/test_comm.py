"""Explicit comm verbs (parallel/comm.py) — the Pstream facade
(reference: src/OpenFOAM/db/IOstreams/Pstreams/, src/Pstream/mpi/).
Runs on the 8 virtual CPU devices (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.apps.cases import make_cavity
from foamtpu.ops import fvm, slot as slot_mod
from foamtpu.parallel import comm, gspmd

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_reduce_and_gather_verbs():
    jmesh = gspmd.space_mesh(8)
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(64, dtype=jnp.float32)

    def kernel(x_l):
        return (comm.reduce_sum(jnp.sum(x_l)),
                comm.reduce_max(jnp.max(x_l)),
                comm.gather_all(x_l))

    fn = jax.shard_map(kernel, mesh=jmesh, in_specs=P("space"),
                       out_specs=(P(), P(), P()), check_vma=False)
    s, m, g = fn(x)
    assert float(s) == float(x.sum())
    assert float(m) == 63.0
    np.testing.assert_array_equal(np.asarray(g), np.asarray(x))


def test_halo_exchange_ring():
    jmesh = gspmd.space_mesh(8)
    x = jnp.arange(64, dtype=jnp.float32)
    left, right = comm.halo_exchange(jmesh, x, width=2)
    left = np.asarray(left).reshape(8, 2)
    right = np.asarray(right).reshape(8, 2)
    xs = np.arange(64, dtype=np.float32).reshape(8, 8)
    for i in range(8):
        np.testing.assert_array_equal(left[i], xs[(i - 1) % 8][-2:])
        np.testing.assert_array_equal(right[i], xs[(i + 1) % 8][:2])


def test_halo_spmv_matches_gspmd_spmv():
    """The explicit ppermute-halo SpMV must equal the implicit (GSPMD)
    roll-based SpMV on the cavity momentum-style Laplacian — the
    processor-interface update done two ways."""
    mesh, state, cfg = make_cavity(16)  # 256 cells / 8 shards = 32 >= H=16
    from foamtpu.core.dimensions import dimViscosity

    p = state["p"]
    m = fvm.laplacian(mesh, jnp.asarray(0.01, mesh.v.dtype), p,
                      corrected=False, gamma_dims=dimViscosity)
    assert mesh.fb_cells.shape[0] == 0
    d_eff = m.diag_eff(mesh)
    psi = jnp.asarray(
        np.random.default_rng(0).standard_normal(mesh.n_cells),
        mesh.v.dtype)

    ref = d_eff * psi + slot_mod.off_apply(mesh, m.soff, m.sfb, psi)

    jmesh = gspmd.space_mesh(8)
    out = comm.halo_spmv(jmesh, mesh.st_deltas, d_eff, m.soff, psi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_sharded_dot():
    jmesh = gspmd.space_mesh(8)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(64), jnp.float32)
    b = jnp.asarray(rng.standard_normal(64), jnp.float32)
    out = comm.sharded_dot(jmesh, a, b)
    np.testing.assert_allclose(float(out), float(jnp.vdot(a, b)),
                               rtol=1e-5)
