"""Field file reader/writer (0/U, 0/p, <time>/... in OpenFOAM format).

Reference: GeometricField I/O (src/OpenFOAM/fields/GeometricFields/) —
FoamFile header + dimensions + internalField + boundaryField. Output is
readable by reference tooling (paraFoam/foamLog interop, SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from fractions import Fraction
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..bc import factory
from ..core.dictionary import FoamDict, Word, parse_file
from ..core.dimensions import DimensionSet
from ..core.fields import VolField
from ..core.precision import scalar_np


def read_field(path: str, mesh, name: Optional[str] = None) -> VolField:
    d = parse_file(path)
    name = name or os.path.basename(path)
    dims = d.get("dimensions", DimensionSet.of())
    if not isinstance(dims, DimensionSet):
        dims = DimensionSet.of()
    cls = str(d.get("FoamFile", {}).get("class", "volScalarField"))
    rank = 1 if "Vector" in cls else 0
    dtype = mesh.v.dtype

    internal = factory.parse_value(d["internalField"], mesh.n_cells, rank, dtype)
    if internal.ndim == 1 and rank == 1:
        internal = jnp.broadcast_to(internal[None, :], (mesh.n_cells, 3))

    bf = d["boundaryField"]
    bcs = []
    for p in mesh.patches:
        spec = bf.match(p.name)
        bcs.append(factory.from_dict(spec, p, rank, dtype))
    from ..bc.patchfields import normalize_bcs

    return VolField(data=internal, bcs=normalize_bcs(mesh, tuple(bcs), rank),
                    name=name, dims=dims)


_HEADER = """/*--------------------------------*- C++ -*----------------------------------*\\
| foamtpu: TPU-native finite-volume framework | Version: 2.2.x-tpu            |
\\*---------------------------------------------------------------------------*/
FoamFile
{{
    version     2.0;
    format      ascii;
    class       {cls};
    location    "{loc}";
    object      {obj};
}}
// * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * //

"""


def _fmt_dims(dims: DimensionSet) -> str:
    def fmt(x: Fraction) -> str:
        return str(int(x)) if x.denominator == 1 else str(float(x))

    return "[" + " ".join(fmt(e) for e in dims.exponents()) + "]"


def _fmt_internal(data: np.ndarray) -> str:
    if data.ndim == 1:
        body = "\n".join(repr(float(x)) for x in data)
        return (f"internalField   nonuniform List<scalar>\n{data.shape[0]}\n"
                f"(\n{body}\n)\n;\n")
    body = "\n".join(
        "(" + " ".join(repr(float(x)) for x in row) + ")" for row in data
    )
    return (f"internalField   nonuniform List<vector>\n{data.shape[0]}\n"
            f"(\n{body}\n)\n;\n")


def _fmt_bvalue(vals: np.ndarray) -> str:
    if vals.ndim == 1:
        u = np.unique(np.round(vals, 12))
        if u.shape[0] == 1:
            return f"uniform {repr(float(u[0]))}"
        body = "\n".join(repr(float(x)) for x in vals)
        return f"nonuniform List<scalar>\n{vals.shape[0]}\n(\n{body}\n)\n"
    if np.allclose(vals, vals[0:1], atol=0.0):
        return "uniform (" + " ".join(repr(float(x)) for x in vals[0]) + ")"
    body = "\n".join(
        "(" + " ".join(repr(float(x)) for x in r) + ")" for r in vals
    )
    return f"nonuniform List<vector>\n{vals.shape[0]}\n(\n{body}\n)\n"


def write_field(field: VolField, mesh, case_dir: str, time_name: str) -> str:
    """Write in OpenFOAM format under <case>/<time>/<name>."""
    data = np.asarray(field.data)
    cls = "volScalarField" if data.ndim == 1 else "volVectorField"
    out_dir = os.path.join(case_dir, time_name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, field.name)

    parts = [_HEADER.format(cls=cls, loc=time_name, obj=field.name)]
    parts.append(f"dimensions      {_fmt_dims(field.dims)};\n\n")
    parts.append(_fmt_internal(data))
    parts.append("\nboundaryField\n{\n")
    from ..bc import patchfields as pf

    for p, bc in zip(mesh.patches, field.bcs):
        parts.append(f"    {p.name}\n    {{\n")
        kind = bc.kind
        out_type = {
            "fixedValue": "fixedValue",
            "zeroGradient": "zeroGradient",
            "empty": "empty",
            "symmetry": "symmetry",
            "symmetryPlane": "symmetryPlane",
            "slip": "slip",
            "calculated": "calculated",
            "mixed": "mixed",
            "fixedGradient": "fixedGradient",
            "inletOutlet": "inletOutlet",
        }.get(kind, kind)
        parts.append(f"        type            {out_type};\n")
        if kind in ("fixedValue", "calculated") or kind.endswith("WallFunction"):
            vals = np.asarray(pf.evaluate(bc, mesh, p, field.data))
            parts.append(f"        value           {_fmt_bvalue(vals)};\n")
        elif kind == "inletOutlet":
            iv = np.asarray(
                jnp.broadcast_to(
                    jnp.asarray(bc.ref_value),
                    (p.size,) if data.ndim == 1 else (p.size, 3),
                )
            )
            parts.append(f"        inletValue      {_fmt_bvalue(iv)};\n")
            vals = np.asarray(pf.evaluate(bc, mesh, p, field.data))
            parts.append(f"        value           {_fmt_bvalue(vals)};\n")
        parts.append("    }\n")
    parts.append("}\n")
    with open(path, "w") as f:
        f.write("".join(parts))
    return path
