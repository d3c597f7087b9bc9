"""probes: point sampling of fields over time
(reference: src/sampling/probes/)."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from .base import FunctionObject, register


class Probes(FunctionObject):
    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        pts = np.asarray(spec.get("probeLocations", []), dtype=float)
        self.points = pts.reshape(-1, 3)
        self.fields = [str(f) for f in spec.get("fields", [])]
        # nearest cell per probe (reference: probes find the containing
        # cell; nearest-centre is equivalent on well-formed probes)
        c = np.asarray(case.mesh.c)
        self.cells = np.array([
            int(np.argmin(((c - p) ** 2).sum(axis=1))) for p in self.points
        ])
        self._files: Dict[str, object] = {}

    def _file(self, field: str):
        if field not in self._files:
            path = os.path.join(self.out_dir, field)
            f = open(path, "a")
            if f.tell() == 0:
                for i, p in enumerate(self.points):
                    f.write(f"# Probe {i} ({p[0]} {p[1]} {p[2]})\n")
                f.write("# Time\n")
            self._files[field] = f
        return self._files[field]

    def execute(self, time_name, state):
        for fname in self.fields:
            src = state.get(fname)
            if src is None and "turb" in state:
                src = state["turb"].get(fname)
            if src is None:
                continue
            data = np.asarray(src.data if hasattr(src, "data") else src)
            f = self._file(fname)
            vals = data[self.cells]
            if vals.ndim == 1:
                row = " ".join(f"{v:.8g}" for v in vals)
            else:
                row = " ".join(
                    "(" + " ".join(f"{x:.8g}" for x in v) + ")" for v in vals
                )
            f.write(f"{time_name} {row}\n")
            f.flush()


register("probes", Probes)
