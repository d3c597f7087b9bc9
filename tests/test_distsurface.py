"""Rank-sharded surface queries (reference:
src/parallel/distributed/distributedTriSurfaceMesh): sharded results
must equal the single-device reference on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from foamtpu.parallel import distsurface as ds


def _sphere_tris(n_theta=12, n_phi=24, r=0.5, centre=(0.0, 0.0, 0.0)):
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi + 1)
    c = np.asarray(centre)
    tris = []
    for i in range(n_theta):
        for j in range(n_phi):
            p = lambda a, b: c + r * np.array([
                np.sin(th[a]) * np.cos(ph[b]),
                np.sin(th[a]) * np.sin(ph[b]), np.cos(th[a])])
            tris.append([p(i, j), p(i + 1, j), p(i + 1, j + 1)])
            tris.append([p(i, j), p(i + 1, j + 1), p(i, j + 1)])
    return np.asarray(tris)


@pytest.fixture(scope="module")
def devmesh():
    devs = np.array(jax.devices())
    if devs.size < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs[:8], ("space",))


def test_sharded_nearest_distance_matches_sphere(devmesh):
    tris = _sphere_tris()
    ts = ds.shard_surface(tris, devmesh)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.0, 1.0, (64, 3)))
    d = np.asarray(ds.nearest_distance(ts, pts, devmesh))
    # analytic distance to the sphere |(|p| - r)| up to faceting error
    exact = np.abs(np.linalg.norm(np.asarray(pts), axis=1) - 0.5)
    assert np.max(np.abs(d - exact)) < 0.02


def test_sharded_inside_matches_winding(devmesh):
    tris = _sphere_tris()
    ts = ds.shard_surface(tris, devmesh)
    rng = np.random.default_rng(1)
    pts_np = rng.uniform(-0.9, 0.9, (128, 3))
    inside = np.asarray(ds.inside(ts, jnp.asarray(pts_np), devmesh))
    exact = np.linalg.norm(pts_np, axis=1) < 0.5
    # exclude points within faceting distance of the surface
    far = np.abs(np.linalg.norm(pts_np, axis=1) - 0.5) > 0.03
    assert (inside[far] == exact[far]).all()


def test_sharded_equals_single_device(devmesh):
    """The sharded query is EXACTLY the single-shard computation."""
    tris = _sphere_tris(6, 12)
    ts = ds.shard_surface(tris, devmesh)
    pts = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (32, 3)))
    d_sharded = np.asarray(ds.nearest_distance(ts, pts, devmesh))
    # single-device reference
    d2 = jax.vmap(lambda p: jnp.min(ds._point_tri_dist2(
        p, jnp.asarray(tris))))(pts)
    d_ref = np.sqrt(np.asarray(d2))
    assert np.max(np.abs(d_sharded - d_ref)) < 1e-6
