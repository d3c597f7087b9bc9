"""Pallas TPU kernel: fused offset-stencil SpMV.

The single hottest motion in the framework is the slot (roll-offset)
sparse matrix-vector product inside every Krylov/smoother iteration
(ops/stencil.py::StencilOp.apply_off + the diagonal multiply):

    y[c] = d[c] x[c] + sum_m soff[c, m] * x[c + delta_m]

XLA compiles each jnp.roll of the flat cell vector into a
lane-granularity relayout (measured ~70-90 us per roll at 160k cells
through the VPU shuffle network — the SpMV is relayout-bound, not
bandwidth-bound). This module splits every flat roll by delta into

    flat index f + d  ==  row r + (d // 128), lane (l + d%128) % 128
                          (+1 row when the lane wraps)

and executes the row shifts (contiguous sublane copies) in XLA outside
the kernel, handing the Pallas kernel two row-shifted views per offset.
Inside the kernel only *lane* rotations (native VPU ops), masked
selects and the coefficient FMAs remain, fused into one pass over a
row-blocked grid.

Layout rules learned the hard way (axon v5e):
  - a [nC, M] coefficient matrix in VMEM tiles its minor dim to 128
    lanes (32x memory waste for M=4) and every column extraction is a
    relayout — scoped-vmem OOM. Coefficients are passed as M separate
    [rows, 128] planes instead.
  - near-array-size sublane rolls (e.g. roll by rows-3) make Mosaic
    materialise pathological copy chains; row shifts stay outside.
  - lane rolls never cross rows, so blocking the grid over rows is
    exact and keeps the VMEM footprint at (3M+3) * BR * 512 bytes.

Coefficients already carry the validity masking (st_valid folded into
soff at assembly), so circular wraparound contributes exactly zero,
matching the jnp.roll reference semantics bit-for-bit.

Enabled by FOAMTPU_PALLAS=1 (opt-in: the XLA roll chain remains the
default until the kernel wins on the target shape — see
tests/test_pallas_spmv.py for the exactness + opt-in wiring).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

_LANE = 128
_BR = 256            # rows per grid block (BR*LANE cells per block)


def enabled() -> bool:
    return os.environ.get("FOAMTPU_PALLAS", "0") not in ("0", "", "false")


@functools.partial(jax.jit, static_argnums=(3,))
def spmv_fused(diag, x, soff, deltas: Tuple[int, ...]):
    """y = diag*x + sum_m soff[:,m]*roll(x, -delta_m) with the shifted
    reads fused into one Pallas kernel. diag/x [nC], soff [nC, M]; nC
    padded internally to a block multiple."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    tile = _LANE * _BR
    npad = ((n + tile - 1) // tile) * tile
    rows = npad // _LANE

    def pad1(a):
        return jnp.pad(a, (0, npad - n))

    xp = pad1(x).reshape(rows, _LANE)
    dp = pad1(diag).reshape(rows, _LANE)

    # per-offset operands: two row-shifted views of x (cheap contiguous
    # sublane copies, done by XLA) + the coefficient plane [rows, LANE]
    ops = []
    for m, d in enumerate(deltas):
        drow = d // _LANE
        ops.append(jnp.roll(xp, -drow, axis=0))
        ops.append(jnp.roll(xp, -(drow + 1), axis=0))
        ops.append(pad1(soff[:, m]).reshape(rows, _LANE))

    dmods = tuple(d % _LANE for d in deltas)

    def kernel(x_ref, d_ref, *refs):
        op_refs, y_ref = refs[:-1], refs[-1]
        xv = x_ref[:]
        acc = d_ref[:] * xv
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, xv.shape, 1)
        for m, dmod in enumerate(dmods):
            a = op_refs[3 * m][:]
            b = op_refs[3 * m + 1][:]
            sm = op_refs[3 * m + 2][:]
            s_lane = (-dmod) % _LANE
            if s_lane:
                a = pltpu.roll(a, s_lane, 1)
                b = pltpu.roll(b, s_lane, 1)
            sel = jnp.where(lane_ids + dmod < _LANE, a, b)
            acc = acc + sm * sel
        y_ref[:] = acc

    interpret = jax.default_backend() not in ("tpu",)
    nin = 2 + len(ops)
    spec = pl.BlockSpec((_BR, _LANE), lambda i: (i, 0))
    y = pl.pallas_call(
        kernel,
        grid=(rows // _BR,),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        in_specs=[spec] * nin,
        out_specs=spec,
        interpret=interpret,
    )(xp, dp, *ops)
    return y.reshape(-1)[:n]
