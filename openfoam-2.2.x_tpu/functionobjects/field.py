"""Field-statistics function objects: fieldMinMax, fieldAverage,
plus the derived-field utilities (vorticity, Q, yPlus-lite)
(reference: src/postProcessing/functionObjects/{field,utilities}/)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops import fvc
from .base import FunctionObject, register


def _get(state, name):
    src = state.get(name)
    if src is None and "turb" in state and state["turb"]:
        src = state["turb"].get(name)
    return src


class FieldMinMax(FunctionObject):
    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.fields = [str(f) for f in spec.get("fields", [])]
        self.path = os.path.join(self.out_dir, "fieldMinMax.dat")
        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write("# Time field min max\n")

    def execute(self, time_name, state):
        with open(self.path, "a") as f:
            for name in self.fields:
                src = _get(state, name)
                if src is None:
                    continue
                d = np.asarray(src.data if hasattr(src, "data") else src)
                if d.ndim == 2:
                    mag = np.linalg.norm(d, axis=1)
                    f.write(f"{time_name} {name} {mag.min():.8g} {mag.max():.8g}\n")
                else:
                    f.write(f"{time_name} {name} {d.min():.8g} {d.max():.8g}\n")


class FieldAverage(FunctionObject):
    """Running time-average of fields (reference: fieldAverage)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.fields = [str(f) for f in spec.get("fields", [])
                       if not isinstance(f, dict)]
        self.means = {}
        self.n = 0

    def execute(self, time_name, state):
        self.n += 1
        w = 1.0 / self.n
        for name in self.fields:
            src = _get(state, name)
            if src is None:
                continue
            d = np.asarray(src.data if hasattr(src, "data") else src)
            if name not in self.means:
                self.means[name] = d.copy()
            else:
                self.means[name] = (1 - w) * self.means[name] + w * d


def vorticity(mesh, U_field):
    """curl(U) [nC,3] (reference: functionObjects/utilities/vorticity)."""
    g = fvc.grad(mesh, U_field)  # g[i,j] = d_i u_j
    return jnp.stack([
        g[:, 1, 2] - g[:, 2, 1],
        g[:, 2, 0] - g[:, 0, 2],
        g[:, 0, 1] - g[:, 1, 0],
    ], axis=1)


def q_criterion(mesh, U_field):
    """Q = 0.5(|Omega|^2 - |S|^2) (reference: utilities/Q)."""
    g = fvc.grad(mesh, U_field)
    s = 0.5 * (g + jnp.swapaxes(g, 1, 2))
    w = 0.5 * (g - jnp.swapaxes(g, 1, 2))
    return 0.5 * (jnp.sum(w * w, axis=(1, 2)) - jnp.sum(s * s, axis=(1, 2)))


register("fieldMinMax", FieldMinMax)
register("fieldAverage", FieldAverage)
