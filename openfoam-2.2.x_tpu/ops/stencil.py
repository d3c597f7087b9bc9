"""Roll-based stencil SpMV — the hot kernel of every linear solve.

Built on the offset-canonical tables (mesh/core.py::offset_stencil):
the matrix-vector product

    Apsi[c] = diag[c]*psi[c] + sum_m off[c,m] * psi[c + d_m]  (+ fallback)

uses jnp.roll for the constant offsets d_m (pure VPU, bandwidth-bound —
measured ~5-30x faster than XLA gather on TPU for FV-sized meshes) and
a small COO gather/scatter for the unstructured remainder.

`off` is materialised once per solve (outside the Krylov while_loop)
from the LDU upper/lower arrays; each solver iteration is then
gather-free.
"""

from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Pallas fused-SpMV dispatch: ON by default on TPU for 1-D operands at
# >= _PALLAS_MIN cells (where the fused kernel beats the jnp.roll chain
# — see BASELINE.md r4 microbench); FOAMTPU_PALLAS=0 opts out.
_PALLAS_MIN = int(os.environ.get("FOAMTPU_PALLAS_MIN", "4096"))


def _pallas_on() -> bool:
    return (os.environ.get("FOAMTPU_PALLAS", "1") not in ("0", "false")
            and jax.default_backend() == "tpu")


class StencilOp(NamedTuple):
    deltas: Tuple[int, ...]
    off: Any          # [nC, M] off-diagonal coeffs in offset-slot order
    fb_cells: Any     # COO fallback
    fb_nbrs: Any
    fb_coeffs: Any

    def apply_off(self, psi: Any) -> Any:
        """offdiag @ psi (no diagonal)."""
        vec = psi.ndim == 2
        acc = jnp.zeros_like(psi)
        for m, d in enumerate(self.deltas):
            coeff = self.off[:, m]
            shifted = jnp.roll(psi, -d, axis=0)
            acc = acc + (coeff[:, None] if vec else coeff) * shifted
        if self.fb_cells.shape[0]:
            contrib = self.fb_coeffs[:, None] * psi[self.fb_nbrs] if vec \
                else self.fb_coeffs * psi[self.fb_nbrs]
            acc = acc.at[self.fb_cells].add(contrib)
        return acc

    def apply_off_t(self, psi: Any) -> Any:
        """offdiag @ psi for a TRANSPOSED multi-RHS operand [C, nC]
        (components leading, cells minor). Keeping cells on the minor
        axis matches the [nC,C] row-major tiling, so the transposes at
        the solve boundary compile to layout bitcasts instead of the
        4-way sliced DMA transpose XLA otherwise inserts between the
        scan carry and the solver while_loop (measured ~2.5 ms/step on
        cavity 400^2, r5 trace)."""
        acc = jnp.zeros_like(psi)
        for m, d in enumerate(self.deltas):
            shifted = jnp.roll(psi, -d, axis=-1)
            acc = acc + self.off[:, m][None, :] * shifted
        if self.fb_cells.shape[0]:
            acc = acc.at[:, self.fb_cells].add(
                self.fb_coeffs[None, :] * psi[:, self.fb_nbrs])
        return acc

    def matvec(self, diag: Any, psi: Any) -> Any:
        """diag*psi + offdiag@psi — THE hot motion of every Krylov/
        smoother iteration. Dispatches to the Pallas fused kernel
        (ops/pallas_spmv.py: one VMEM pass, no lane relayouts) on TPU;
        falls back to the jnp.roll chain elsewhere. Reference hot path:
        lduMatrix::Amul (src/OpenFOAM/matrices/lduMatrix/)."""
        if (psi.ndim == 1 and psi.shape[0] >= _PALLAS_MIN
                and self.deltas and _pallas_on()):
            from . import pallas_spmv

            acc = pallas_spmv.spmv_fused(diag, psi, self.off, self.deltas)
            if self.fb_cells.shape[0]:
                acc = acc.at[self.fb_cells].add(
                    self.fb_coeffs * psi[self.fb_nbrs])
            return acc
        return diag * psi + self.apply_off(psi)


def from_tables(deltas, st_cface, st_sign, st_valid,
                fb_cells, fb_faces, fb_signs, fb_nbrs,
                upper: Any, lower: Any) -> StencilOp:
    """Materialise per-offset coefficients from LDU upper/lower.
    Row convention (ops/matrix.py): rows where the cell owns the face
    use `upper`, else `lower`."""
    up = upper[st_cface]
    lo = lower[st_cface]
    off = jnp.where(st_sign > 0, up, lo) * st_valid
    if fb_cells.shape[0]:
        fb_coeffs = jnp.where(fb_signs > 0, upper[fb_faces], lower[fb_faces])
    else:
        fb_coeffs = jnp.zeros((0,), off.dtype)
    return StencilOp(tuple(deltas), off, fb_cells, fb_nbrs, fb_coeffs)


def mesh_stencil(mesh, upper: Any, lower: Any) -> StencilOp:
    return from_tables(
        mesh.st_deltas, mesh.st_cface, mesh.st_sign, mesh.st_valid,
        mesh.fb_cells, mesh.fb_faces, mesh.fb_signs, mesh.fb_nbrs,
        upper, lower,
    )


def make_amul(st: StencilOp, diag_eff: Any) -> Callable:
    vec = diag_eff.ndim == 2

    def amul(psi: Any) -> Any:
        return diag_eff * psi + st.apply_off(psi)

    return amul
