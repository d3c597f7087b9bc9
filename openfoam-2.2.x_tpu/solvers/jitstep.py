"""Jit entry helpers: pass the mesh and GAMG hierarchies as ARGUMENTS.

Closing over the FvMesh/GAMG-level arrays bakes them into the XLA
program as constants; at 1M+ cells that is hundreds of MB of literals
and the tunneled remote-compile rejects the request (HTTP 413) — and
even when it fits, argument-passing lets the runtime reuse the buffers
instead of materialising constants. The GAMG objects live inside the
(static) solver-control dicts, so their level pytrees are extracted
here, passed as traced arguments, and re-bound during tracing.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax


def collect_gamg(control_dicts: Sequence[Any]):
    gs = []
    for c in control_dicts:
        if isinstance(c, dict) and c.get("_gamg") is not None:
            g = c["_gamg"]
            if all(g is not x for x in gs):
                gs.append(g)
    return gs


def jit_with_mesh(fn: Callable, mesh, control_dicts: Sequence[Any]):
    """jit `fn(mesh, *args)` with the mesh and any GAMG hierarchies as
    traced arguments. Returns a callable taking `*args`."""
    gs = collect_gamg(control_dicts)
    levels0 = [g.levels for g in gs]

    @jax.jit
    def inner(mesh_a, levels_a, *args):
        for g, lv in zip(gs, levels_a):
            g.levels = lv
        try:
            return fn(mesh_a, *args)
        finally:
            for g, lv0 in zip(gs, levels0):
                g.levels = lv0

    def _strong(x):
        # canonicalise weak-typed leaves: a state leaf whose weak_type
        # flips between calls (e.g. a BC array rebuilt from Python
        # scalars inside the step) otherwise forces a full retrace +
        # recompile on the SECOND call — measured as a spurious
        # 0.2 s/iter "first timed trial" in bench_pitz (round 3)
        if isinstance(x, jax.Array) and x.weak_type:
            return jax.lax.convert_element_type(x, x.dtype)
        return x

    return lambda *args: inner(mesh, levels0,
                               *jax.tree_util.tree_map(_strong, args))
