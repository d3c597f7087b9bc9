"""Command-line utilities — the applications/utilities equivalents.

Usage (via the foamtpu package):
    python -m foamtpu blockMesh  -case <dir>
    python -m foamtpu checkMesh  -case <dir>
    python -m foamtpu run        -case <dir> [-steps N]   # runs controlDict application
    python -m foamtpu decomposePar -case <dir>            # prints partition summary
    python -m foamtpu foamToVTK  -case <dir> [-time t]

Reference: applications/utilities/mesh/generation/blockMesh/,
mesh/manipulation/checkMesh/, postProcessing/dataConversion/foamToVTK/.
"""

from __future__ import annotations

import argparse
import os
import sys


def _case_arg(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("-case", default=".")
    ap.add_argument("-steps", type=int, default=None)
    ap.add_argument("-time", default=None)
    return ap.parse_args(argv)


def block_mesh(argv) -> int:
    args = _case_arg(argv)
    from ..core.dictionary import parse_file
    from ..io import polymesh as mesh_io
    from ..mesh import blockmesh

    for cand in ("constant/polyMesh/blockMeshDict", "system/blockMeshDict"):
        path = os.path.join(args.case, cand)
        if os.path.exists(path):
            break
    else:
        print("blockMesh: no blockMeshDict found", file=sys.stderr)
        return 1
    mesh = blockmesh.generate(path)
    out = os.path.join(args.case, "constant", "polyMesh")
    mesh_io.write(mesh, out)
    print(f"blockMesh: wrote {mesh.n_cells} cells, {mesh.n_faces} faces, "
          f"{len(mesh.patches)} patches -> {out}")
    return 0


def check_mesh(argv) -> int:
    args = _case_arg(argv)
    from ..io import polymesh as mesh_io
    from ..mesh.check import check

    mesh = mesh_io.read(os.path.join(args.case, "constant", "polyMesh"))
    stats = check(mesh, verbose=True)
    print("Mesh OK.")
    return 0


def run(argv) -> int:
    args = _case_arg(argv)
    from ..core.case import run_case

    run_case(args.case, max_steps=args.steps)
    return 0


def decompose_par(argv) -> int:
    args = _case_arg(argv)
    from ..core.dictionary import parse_file
    from ..io import polymesh as mesh_io
    from ..parallel import partition

    mesh = mesh_io.read(os.path.join(args.case, "constant", "polyMesh"))
    dd_path = os.path.join(args.case, "system", "decomposeParDict")
    n = 4
    if os.path.exists(dd_path):
        n = int(parse_file(dd_path).get("numberOfSubdomains", 4))
    parts = partition.decompose(mesh, n)
    import numpy as np

    sizes = np.bincount(parts, minlength=n)
    cut = partition.cut_faces(mesh, parts)
    print(f"decomposePar: {n} subdomains, cell counts {sizes.tolist()}, "
          f"{cut} cut faces (on-device GSPMD sharding uses this ordering)")
    return 0


def foam_to_vtk(argv) -> int:
    args = _case_arg(argv)
    from ..io import vtk as vtk_io

    out = vtk_io.case_to_vtk(args.case, time_name=args.time)
    print(f"foamToVTK: wrote {out}")
    return 0


def set_fields(argv) -> int:
    """setFields: initialise field regions from system/setFieldsDict
    (reference: applications/utilities/preProcessing/setFields/).
    Supports boxToCell + volScalar/VectorFieldValue."""
    import jax.numpy as jnp
    import numpy as np

    from ..core.case import Case
    from ..core.dictionary import parse_file
    from ..io import fields as field_io

    args = _case_arg(argv)
    case = Case(args.case)
    mesh = case.mesh
    d = parse_file(os.path.join(args.case, "system", "setFieldsDict"))

    def parse_values(lst):
        out = {}
        items = list(lst) if isinstance(lst, list) else [lst]
        i = 0
        while i < len(items) - 2:
            if str(items[i]).endswith("FieldValue"):
                out[str(items[i + 1])] = items[i + 2]
                i += 3
            else:
                i += 1
        return out

    fields = {}
    for name, val in parse_values(d.get("defaultFieldValues", [])).items():
        f = case.read_field(name)
        v = jnp.broadcast_to(jnp.asarray(np.asarray(val, dtype=float),
                                         mesh.v.dtype), f.data.shape)
        fields[name] = f.with_data(v)

    c = np.asarray(mesh.c)
    regions = d.get("regions", [])
    items = list(regions) if isinstance(regions, list) else [regions]
    i = 0
    while i < len(items):
        kind = str(items[i])
        spec = items[i + 1] if i + 1 < len(items) else None
        i += 2
        if kind != "boxToCell" or spec is None:
            continue
        box = np.asarray(spec["box"], dtype=float).reshape(2, 3)
        mask = np.all((c >= box[0]) & (c <= box[1]), axis=1)
        for name, val in parse_values(spec.get("fieldValues", [])).items():
            f = fields.get(name) or case.read_field(name)
            v = jnp.asarray(np.asarray(val, dtype=float), mesh.v.dtype)
            data = np.array(f.data)  # writable host copy
            data[mask] = np.asarray(v)
            fields[name] = f.with_data(jnp.asarray(data))

    from ..core import runtime

    tname = runtime.time_name(case.time.start_time)
    for f in fields.values():
        field_io.write_field(f, mesh, case.dir, tname)
    print(f"setFields: updated {sorted(fields)} at time {tname}")
    return 0


def renumber_mesh(argv) -> int:
    """renumberMesh: RCM cell renumbering for bandwidth/locality
    (reference: applications/utilities/mesh/manipulation/renumberMesh/)."""
    args = _case_arg(argv)
    from ..io import polymesh as mesh_io
    from ..mesh import renumber as rn

    mdir = os.path.join(args.case, "constant", "polyMesh")
    mesh = mesh_io.read(mdir)
    bw0 = rn.bandwidth(mesh)
    new, order = rn.renumber(mesh)
    mesh_io.write(new, mdir)
    print(f"renumberMesh: bandwidth {bw0} -> {rn.bandwidth(new)}")
    return 0


def box_turb(argv) -> int:
    """boxTurb: divergence-free synthetic turbulence initial U field
    (reference: applications/utilities/preProcessing/boxTurb/ +
    constant/boxTurbDict {Ea; k0; seed;}). Requires a uniform
    single-box mesh; grid dims inferred from the cell centres."""
    args = _case_arg(argv)
    import jax.numpy as jnp
    import numpy as np

    from ..core.case import Case
    from ..core.dictionary import parse_file
    from ..core import runtime
    from ..io import fields as field_io
    from ..models import randomprocesses as rp

    case = Case(args.case)
    mesh = case.mesh
    d = parse_file(os.path.join(args.case, "constant", "boxTurbDict"))
    Ea = float(d.get("Ea", 1.0))
    k0 = float(d.get("k0", 5.0))
    seed = int(d.get("seed", 0))

    c = np.asarray(mesh.c)
    lo, hi = c.min(axis=0), c.max(axis=0)
    dims = []
    for ax in range(3):
        u = np.unique(np.round((c[:, ax] - lo[ax]) /
                               max(hi[ax] - lo[ax], 1e-30) * 1e6))
        dims.append(len(u))
    nx, ny, nz = dims
    assert nx * ny * nz == mesh.n_cells, (
        f"boxTurb needs a uniform box mesh; inferred {dims} vs "
        f"{mesh.n_cells} cells")
    L = hi - lo + (hi - lo) / (np.maximum(np.asarray(dims), 2) - 1 + 1e-30)
    u = rp.box_turb((nx, ny, nz), L, Ea, k0, seed)
    # map grid -> cell ordering via index lookup
    span = np.maximum(hi - lo, 1e-30)
    idx = np.round((c - lo) / span * (np.asarray(dims) - 1)).astype(int)
    flat = u[idx[:, 0], idx[:, 1], idx[:, 2], :]
    U = case.read_field("U")
    U = U.with_data(jnp.asarray(flat, mesh.v.dtype))
    tname = runtime.time_name(case.time.start_time)
    field_io.write_field(U, mesh, case.dir, tname)
    tke = 0.5 * float(np.mean(np.sum(flat * flat, axis=1)))
    print(f"boxTurb: wrote U ({nx}x{ny}x{nz}), k = {tke:.4g} "
          f"(target {1.5 * Ea:.4g})")
    return 0


COMMANDS = {
    "blockMesh": block_mesh,
    "renumberMesh": renumber_mesh,
    "checkMesh": check_mesh,
    "run": run,
    "decomposePar": decompose_par,
    "foamToVTK": foam_to_vtk,
    "setFields": set_fields,
    "boxTurb": box_turb,
}


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd = argv[0]
    # allow `python -m foamtpu icoFoam -case ...` style too
    if cmd not in COMMANDS:
        from ..core.case import run_case, Case

        args = _case_arg(argv[1:])
        case = Case(args.case)
        if case.application == cmd or cmd in ("icoFoam",):
            run_case(args.case, max_steps=args.steps)
            return 0
        print(f"unknown command {cmd!r}; available: {sorted(COMMANDS)}",
              file=sys.stderr)
        return 1
    return COMMANDS[cmd](argv[1:])
