"""fieldValues + run-control function objects.

Reference: src/postProcessing/functionObjects/field/fieldValues/
{cellSource,faceSource} (zone/patch reductions), utilities/systemCall,
jobControl/abortCalculation, field/nearWallFields."""

from __future__ import annotations

import os
import subprocess

import numpy as np

from ..core.dictionary import FoamDict
from .base import FunctionObject, register
from .field import _get


_OPS = {
    "sum": lambda v, w: (v * w[..., None] if v.ndim == 2 else v * w)
    .sum(axis=0),
    "average": lambda v, w: (v * w[..., None] if v.ndim == 2
                             else v * w).sum(axis=0)
    / max(w.sum(), 1e-300),
    "weightedAverage": lambda v, w: (v * w[..., None] if v.ndim == 2
                                     else v * w).sum(axis=0)
    / max(w.sum(), 1e-300),
    "volAverage": lambda v, w: (v * w[..., None] if v.ndim == 2
                                else v * w).sum(axis=0)
    / max(w.sum(), 1e-300),
    "volIntegrate": lambda v, w: (v * w[..., None] if v.ndim == 2
                                  else v * w).sum(axis=0),
    "areaAverage": lambda v, w: (v * w[..., None] if v.ndim == 2
                                 else v * w).sum(axis=0)
    / max(w.sum(), 1e-300),
    "areaIntegrate": lambda v, w: (v * w[..., None] if v.ndim == 2
                                   else v * w).sum(axis=0),
    "min": lambda v, w: v.min(axis=0),
    "max": lambda v, w: v.max(axis=0),
    "none": lambda v, w: np.asarray(0.0),
}


def _fmt(x) -> str:
    x = np.asarray(x)
    if x.ndim == 0:
        return f"{float(x):.8g}"
    return "(" + " ".join(f"{float(v):.8g}" for v in x) + ")"


class FieldValueCell(FunctionObject):
    """fieldValues cellSource: reduce fields over a cellZone / box /
    all cells with volume weights."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.fields = [str(f) for f in spec.get("fields", [])]
        self.op = str(spec.get("operation", "volAverage"))
        mesh = case.mesh
        src = str(spec.get("source", spec.get("regionType", "all")))
        c = np.asarray(mesh.c)
        if src in ("cellZone", "cellZoneToCell"):
            zname = str(spec.get("sourceName", spec.get("name", "")))
            masks = getattr(mesh, "cell_zone_masks", None) or {}
            self.mask = np.asarray(masks.get(zname,
                                             np.ones(mesh.n_cells)))
        elif src == "box":
            box = np.asarray(spec.get("box"), float).reshape(2, 3)
            self.mask = np.all((c >= box[0]) & (c <= box[1]),
                               axis=1).astype(float)
        else:
            self.mask = np.ones(mesh.n_cells)
        self.w = np.asarray(mesh.v) * self.mask
        self.path = os.path.join(self.out_dir, "fieldValue.dat")
        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write(f"# Time {self.op} " + " ".join(self.fields)
                        + "\n")

    def execute(self, time_name, state):
        vals = []
        for name in self.fields:
            srcf = _get(state, name)
            if srcf is None:
                vals.append("n/a")
                continue
            d = np.asarray(srcf.data if hasattr(srcf, "data") else srcf)
            sel = self.mask > 0
            vals.append(_fmt(_OPS[self.op](d[sel], self.w[sel])))
        with open(self.path, "a") as f:
            f.write(f"{time_name} " + " ".join(vals) + "\n")


class FieldValueFace(FunctionObject):
    """fieldValues faceSource: reduce fields over one patch with
    area weights."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.fields = [str(f) for f in spec.get("fields", [])]
        self.op = str(spec.get("operation", "areaAverage"))
        pname = str(spec.get("sourceName", spec.get("name", "")))
        mesh = case.mesh
        self.patch = None
        for p in mesh.patches:
            if p.name == pname:
                self.patch = p
                break
        if self.patch is None:
            raise ValueError(f"fieldValues {name!r}: no patch "
                             f"{pname!r}")
        self.w = np.asarray(mesh.mag_sf)[self.patch.slice]
        self.path = os.path.join(self.out_dir, "faceSource.dat")
        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write(f"# Time {self.op}({pname}) "
                        + " ".join(self.fields) + "\n")

    def execute(self, time_name, state):
        mesh = self.case.mesh
        vals = []
        for name in self.fields:
            srcf = _get(state, name)
            if srcf is None or not hasattr(srcf, "boundary_values"):
                vals.append("n/a")
                continue
            bv = np.asarray(srcf.boundary_values(mesh))
            nif = mesh.n_internal_faces
            sl = slice(self.patch.slice.start - nif,
                       self.patch.slice.stop - nif)
            vals.append(_fmt(_OPS[self.op](bv[sl], self.w)))
        with open(self.path, "a") as f:
            f.write(f"{time_name} " + " ".join(vals) + "\n")


def _field_values(name, spec, case):
    t = str(spec.get("type", ""))
    src = str(spec.get("source", spec.get("regionType", "all")))
    if t == "faceSource" or src in ("faceSource", "patch",
                                    "patchToFace"):
        return FieldValueFace(name, spec, case)
    return FieldValueCell(name, spec, case)


class _FieldValuesDispatch(FunctionObject):
    def __new__(cls, name, spec, case):
        return _field_values(name, spec, case)


class SystemCall(FunctionObject):
    """systemCall: run shell commands each write (reference:
    utilities/systemCall — executeCalls honoured; the write/end call
    lists run at the same hook)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        calls = spec.get("executeCalls", spec.get("writeCalls", []))
        self.calls = [str(x) for x in
                      (calls if isinstance(calls, list) else [calls])]

    def execute(self, time_name, state):
        for cmd in self.calls:
            subprocess.run(cmd, shell=True, check=False)  # noqa: S602


class AbortCalculation(FunctionObject):
    """abortCalculation: stop the run when the trigger file appears
    (reference: jobControl/abortCalculation) — sets Time.stop_now so
    the loop exits cleanly at the next step boundary."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.file = str(spec.get("fileName",
                                 os.path.join(case.dir, "ABORT")))
        if not os.path.isabs(self.file):
            self.file = os.path.join(case.dir, self.file)

    def execute(self, time_name, state):
        if os.path.exists(self.file):
            self.case.time.stop_now = True
            print(f"abortCalculation: trigger {self.file} found — "
                  "stopping")


class NearWallFields(FunctionObject):
    """nearWallFields: sample wall-adjacent CELL values of fields into
    new <field>Near volFields written at write times (reference:
    field/nearWallFields — there the patch-face value at distance;
    the wall-adjacent cell is this rebuild's sampling point)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        pairs = spec.get("fields", [])
        self.pairs = []
        items = pairs if isinstance(pairs, list) else [pairs]
        i = 0
        flat = []
        for x in items:
            flat.extend(np.asarray(x, dtype=object).reshape(-1)
                        if isinstance(x, (list, tuple, np.ndarray))
                        else [x])
        while i + 1 < len(flat):
            self.pairs.append((str(flat[i]), str(flat[i + 1])))
            i += 2
        if not self.pairs:
            self.pairs = [("U", "UNear")]
        self.patches = [str(x) for x in spec.get("patches", [])]

    def execute(self, time_name, state):
        import jax.numpy as jnp

        from ..core.fields import vol_scalar, vol_vector
        from ..io import fields as field_io

        mesh = self.case.mesh
        own = []
        for p in mesh.patches:
            if (not self.patches and p.type == "wall") \
                    or p.name in self.patches:
                own.append(np.asarray(mesh.owner[p.slice]))
        if not own:
            return
        own = np.concatenate(own)
        for src_name, dst_name in self.pairs:
            srcf = _get(state, src_name)
            if srcf is None:
                continue
            d = np.asarray(srcf.data if hasattr(srcf, "data") else srcf)
            out = np.zeros_like(d)
            out[own] = d[own]
            mk = vol_vector if d.ndim == 2 else vol_scalar
            f = mk(mesh, (0.0, 0.0, 0.0) if d.ndim == 2 else 0.0,
                   name=dst_name).with_data(
                jnp.asarray(out, mesh.v.dtype))
            field_io.write_field(f, mesh, self.case.dir, time_name)


register("fieldValues", _FieldValuesDispatch)
register("cellSource", _FieldValuesDispatch)
register("faceSource", _FieldValuesDispatch)
register("systemCall", SystemCall)
register("abortCalculation", AbortCalculation)
register("nearWallFields", NearWallFields)
