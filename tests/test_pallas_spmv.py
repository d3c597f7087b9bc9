"""Pallas fused offset-stencil SpMV (ops/pallas_spmv.py): exactness vs
the XLA roll chain, including wrap/pad edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foamtpu.ops import pallas_spmv


def _reference(diag, x, soff, deltas):
    acc = diag * x
    for m, d in enumerate(deltas):
        acc = acc + soff[:, m] * jnp.roll(x, -d)
    return acc


def _mask_valid(soff, deltas, n):
    """Zero coefficients whose neighbour c+d is out of range — the
    st_valid contract the mesh tables guarantee."""
    s = np.array(soff)
    idx = np.arange(n)
    for m, d in enumerate(deltas):
        s[(idx + d < 0) | (idx + d >= n), m] = 0.0
    return jnp.asarray(s)


@pytest.mark.parametrize("n,deltas", [
    (1024, (1, -1, 16, -16)),
    (160000, (1, -1, 400, -400)),
    (5000, (1, -1, 128, -128, 3000, -3000)),
])
def test_pallas_spmv_matches_roll_chain(n, deltas):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    diag = jnp.asarray(rng.standard_normal(n), jnp.float32)
    soff = _mask_valid(rng.standard_normal((n, len(deltas))), deltas, n)
    ref = np.asarray(_reference(diag, x, soff, deltas))
    got = np.asarray(pallas_spmv.spmv_fused(diag, x, soff, deltas))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-5)
