"""Miscellaneous function objects, batch 3 (reference:
src/postProcessing/functionObjects/{field,utilities,IO,system}/):

  readFields                  (field/readFields/ — load fields from
                               the time directory into the FO state)
  surfaceInterpolateFields    (field/surfaceInterpolateFields/)
  regionSizeDistribution      (field/regionSizeDistribution/ —
                               droplet/blob volume histogram of a
                               thresholded indicator field)
  fieldCoordinateSystemTransform (field/fieldCoordinateSystemTransform/)
  CourantNo                   (utilities/CourantNo/)
  writeDictionary             (utilities/writeDictionary/)
  timeActivatedFileUpdate     (utilities/timeActivatedFileUpdate/)

Not built (n/a by design): partialWrite / writeRegisteredObject /
removeRegisteredObject — they operate on the objectRegistry, which
this framework replaces with the explicit Case state pytree; the
equivalent control is controlDict writeControl + purgeWrite.
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from .base import FunctionObject, register
from .field import _get


class ReadFields(FunctionObject):
    """Load the named fields from the current (or latest) time dir and
    inject them into the FO state so downstream objects can use them."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.fields = [str(f) for f in spec.get("fields", [])]

    def execute(self, time_name, state):
        for nm in self.fields:
            if nm in state:
                continue
            try:
                state[nm] = self.case.read_field(nm, time=time_name)
            except Exception:
                pass


class SurfaceInterpolateFields(FunctionObject):
    """Write face-interpolated copies of vol fields (reference writes
    surfaceFields named <f>Near; here: postProcessing series of face
    values at write times)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        fl = spec.get("fields", [])
        # accepts (U phi) or ((U Unear) (p pNear)) forms
        self.fields = []
        for f in fl:
            if isinstance(f, (list, tuple)):
                self.fields.append((str(f[0]), str(f[-1])))
            else:
                self.fields.append((str(f), str(f) + "Near"))

    def execute(self, time_name, state):
        import jax.numpy as jnp

        from ..ops import surface

        mesh = self.case.mesh
        for src_name, out_name in self.fields:
            src = _get(state, src_name)
            if src is None:
                continue
            d = src.data if hasattr(src, "data") else src
            fi = surface.interpolate_internal(mesh, jnp.asarray(d))
            out = os.path.join(self.out_dir,
                               f"{out_name}_{time_name}.dat")
            arr = np.asarray(fi)
            with open(out, "w") as f:
                f.write(f"# {out_name}: internal-face interpolate of "
                        f"{src_name} at t={time_name}\n")
                np.savetxt(f, arr.reshape(arr.shape[0], -1),
                           fmt="%.8g")


class RegionSizeDistribution(FunctionObject):
    """Volume histogram of connected regions where field > threshold
    (droplets of alpha, matching the reference's droplet semantics;
    reference: regionSizeDistribution — the FaceCellWave regionSplit
    there is a host union-find here)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.field = str(spec.get("field", "alpha1"))
        self.threshold = float(spec.get("threshold", 0.5))
        self.n_bins = int(spec.get("nBins", 10))
        self.path = os.path.join(self.out_dir, "distribution.dat")

    def execute(self, time_name, state):
        src = _get(state, self.field)
        if src is None:
            return
        d = np.asarray(src.data if hasattr(src, "data") else src)
        mesh = self.case.mesh
        keep = d > self.threshold
        owner = np.asarray(mesh.owner)
        nif = int(mesh.n_internal_faces)
        nei = np.asarray(mesh.neighbour)[:nif] \
            if np.asarray(mesh.neighbour).ndim else None
        n = keep.size
        parent = np.arange(n)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for o, m in zip(owner[:nif], nei):
            if keep[o] and keep[m]:
                a, b = find(int(o)), find(int(m))
                if a != b:
                    parent[max(a, b)] = min(a, b)
        vols = {}
        V = np.asarray(mesh.v)
        for c in np.nonzero(keep)[0]:
            r = find(int(c))
            vols[r] = vols.get(r, 0.0) + float(V[c])
        sizes = np.asarray(sorted(vols.values()))
        with open(self.path, "a") as f:
            if sizes.size == 0:
                f.write(f"{time_name} 0\n")
                return
            hist, edges = np.histogram(sizes, bins=self.n_bins)
            f.write(f"{time_name} {sizes.size} "
                    + " ".join(f"{e:.6g}:{h}" for e, h in
                               zip(edges[:-1], hist)) + "\n")


class FieldCoordinateSystemTransform(FunctionObject):
    """Rotate vector fields into a local (e1, e3) coordinate system
    and record the transformed components (reference:
    fieldCoordinateSystemTransform)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.fields = [str(f) for f in spec.get("fields", ["U"])]
        cs = spec.get("coordinateSystem", spec)
        e1 = np.asarray(cs.get("e1", (1.0, 0.0, 0.0)),
                        dtype=float).reshape(-1)[-3:]
        e3 = np.asarray(cs.get("e3", (0.0, 0.0, 1.0)),
                        dtype=float).reshape(-1)[-3:]
        e1 = e1 / np.linalg.norm(e1)
        e3 = e3 - e1 * (e3 @ e1)
        e3 = e3 / np.linalg.norm(e3)
        e2 = np.cross(e3, e1)
        self.R = np.stack([e1, e2, e3])      # rows = local axes

    def execute(self, time_name, state):
        for nm in self.fields:
            src = _get(state, nm)
            if src is None:
                continue
            d = np.asarray(src.data if hasattr(src, "data") else src)
            if d.ndim != 2:
                continue
            loc = d @ self.R.T
            out = os.path.join(self.out_dir,
                               f"{nm}Transformed_{time_name}.dat")
            with open(out, "w") as f:
                f.write(f"# {nm} in local frame (rows e1 e2 e3 = "
                        f"{self.R.tolist()})\n")
                np.savetxt(f, loc, fmt="%.8g")


class CourantNo(FunctionObject):
    """Record max/mean Courant number from the face flux (reference:
    postProcessing/functionObjects/utilities/CourantNo/)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.path = os.path.join(self.out_dir, "CourantNo.dat")
        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write("# Time mean max\n")

    def execute(self, time_name, state):
        phi = state.get("phi")
        dt = state.get("dt", self.case.time.delta_t
                       if hasattr(self.case, "time") else 1.0)
        if phi is None:
            return
        mesh = self.case.mesh
        phi_a = np.asarray(phi.data if hasattr(phi, "data") else phi)
        nif = int(mesh.n_internal_faces)
        owner = np.asarray(mesh.owner)
        nei = np.asarray(mesh.neighbour)[:nif]
        V = np.asarray(mesh.v)
        acc = np.zeros(V.shape)
        np.add.at(acc, owner[:nif], np.abs(phi_a[:nif]))
        np.add.at(acc, nei, np.abs(phi_a[:nif]))
        np.add.at(acc, owner[nif:], np.abs(phi_a[nif:]))
        co = 0.5 * acc / V * float(dt)
        with open(self.path, "a") as f:
            f.write(f"{time_name} {co.mean():.8g} {co.max():.8g}\n")


class WriteDictionary(FunctionObject):
    """Dump the named dictionaries' entries at each execute
    (reference: utilities/writeDictionary)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.names = [str(d) for d in spec.get("dictNames", [])]
        self.path = os.path.join(self.out_dir, "dictionaries.log")

    def execute(self, time_name, state):
        from ..core.dictionary import parse_file

        with open(self.path, "a") as f:
            for nm in self.names:
                for sub in ("system", "constant"):
                    p = os.path.join(self.case.dir, sub, nm)
                    if os.path.exists(p):
                        d = parse_file(p)
                        f.write(f"--- {nm} @ t={time_name}\n")
                        for k, v in d.items():
                            f.write(f"    {k} {v}\n")
                        break


class TimeActivatedFileUpdate(FunctionObject):
    """Swap fileToUpdate with the staged copy once the trigger time
    passes (reference: utilities/timeActivatedFileUpdate — pairs with
    runTimeModifiable)."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        self.target = str(spec.get("fileToUpdate", ""))
        rows = spec.get("timeVsFile", [])
        self.table = []
        for r in rows:
            if isinstance(r, (list, tuple)) and len(r) >= 2:
                self.table.append((float(r[0]), str(r[1])))
        self.applied = -1

    def execute(self, time_name, state):
        try:
            t = float(time_name)
        except ValueError:
            return
        tgt = self.target.replace("$FOAM_CASE", self.case.dir)
        for i, (ti, src) in enumerate(self.table):
            if t >= ti and i > self.applied:
                s = src.replace("$FOAM_CASE", self.case.dir)
                if os.path.exists(s):
                    shutil.copyfile(s, tgt)
                    self.applied = i
                    print(f"timeActivatedFileUpdate: {s} -> {tgt} "
                          f"at t={time_name}")


class Coded(FunctionObject):
    """User-coded functionObject (reference: the codedFunctionObject /
    OutputFilterFunctionObject `coded` type in
    src/postProcessing/functionObjects + db/dynamicLibrary/codedBase —
    there a C++ snippet compiled by wmake and dlopened; here a PYTHON
    snippet, the same dynamicCode analogue as codedFixedValue and
    codedSource). The `codeExecute` (or `code`) snippet runs every
    execute() with this namespace:

        np, jnp     numpy / jax.numpy
        mesh        the device mesh
        state       the live solver-state dict (read AND write)
        time_name   current time as written (str), time (float or None)
        store       a dict persisting across calls
        output(s)   append a line to postProcessing/<name>/0/<name>.dat

    Exceptions are caught by FunctionObjectList (run keeps going), as
    the reference's FatalError-in-FO policy does not."""

    def __init__(self, name, spec, case):
        super().__init__(name, spec, case)
        code = spec.get("codeExecute", spec.get("code", ""))
        self.code = compile(str(code), f"<codedFunctionObject:{name}>",
                            "exec")
        self.store: dict = {}
        self.path = os.path.join(self.out_dir, "0", f"{name}.dat")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

    def execute(self, time_name, state):
        import jax.numpy as jnp

        def output(s):
            with open(self.path, "a") as f:
                f.write(str(s).rstrip("\n") + "\n")

        try:
            t = float(time_name)
        except ValueError:
            t = None
        ns = {"np": np, "jnp": jnp, "mesh": self.case.mesh,
              "state": state, "time_name": time_name, "time": t,
              "store": self.store, "output": output,
              "case": self.case}
        exec(self.code, ns)  # noqa: S102 — dynamicCode analogue


register("coded", Coded)
register("codedFunctionObject", Coded)
register("readFields", ReadFields)
register("surfaceInterpolateFields", SurfaceInterpolateFields)
register("regionSizeDistribution", RegionSizeDistribution)
register("fieldCoordinateSystemTransform",
         FieldCoordinateSystemTransform)
register("CourantNo", CourantNo)
register("writeDictionary", WriteDictionary)
register("timeActivatedFileUpdate", TimeActivatedFileUpdate)
