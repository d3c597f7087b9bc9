"""Binary + gzip field I/O round-trip (reference: writeFormat binary;
writeCompression on; — src/OpenFOAM/db/IOstreams/ write path)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from foamtpu.apps.cases import make_cavity
from foamtpu.io import fields as field_io


@pytest.fixture(scope="module")
def cavity():
    mesh, state, cfg = make_cavity(8)
    rng = np.random.default_rng(7)
    U = state["U"].with_data(
        jnp.asarray(rng.standard_normal((mesh.n_cells, 3)), mesh.v.dtype))
    p = state["p"].with_data(
        jnp.asarray(rng.standard_normal(mesh.n_cells), mesh.v.dtype))
    return mesh, U, p


@pytest.mark.parametrize("fmt,compress", [
    ("ascii", False), ("ascii", True), ("binary", False), ("binary", True),
])
def test_field_roundtrip(cavity, tmp_path, fmt, compress):
    mesh, U, p = cavity
    for f in (U, p):
        path = field_io.write_field(f, mesh, str(tmp_path), "0.1",
                                    fmt=fmt, compress=compress)
        assert os.path.exists(path)
        if compress:
            assert path.endswith(".gz")
        back = field_io.read_field(
            os.path.join(str(tmp_path), "0.1", f.name), mesh, name=f.name)
        np.testing.assert_allclose(np.asarray(back.data),
                                   np.asarray(f.data), rtol=1e-6, atol=1e-7)
        assert back.dims == f.dims
        assert tuple(b.kind for b in back.bcs) == tuple(
            b.kind for b in f.bcs)


def test_binary_smaller_than_ascii(cavity, tmp_path):
    mesh, U, _ = cavity
    pa = field_io.write_field(U, mesh, str(tmp_path), "a", fmt="ascii")
    pb = field_io.write_field(U, mesh, str(tmp_path), "b", fmt="binary")
    assert os.path.getsize(pb) < os.path.getsize(pa)


def test_case_write_format(tmp_path):
    """controlDict writeFormat/writeCompression drive Case.write_fields
    and the output reloads identically."""
    import shutil
    from foamtpu.core.case import run_case

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tutorials", "incompressible",
        "icoFoam", "cavity")
    dst = os.path.join(str(tmp_path), "cavity")
    shutil.copytree(src, dst)
    cd = os.path.join(dst, "system", "controlDict")
    txt = open(cd).read().replace("writeFormat     ascii;",
                                  "writeFormat     binary;")
    txt = txt.replace("writeCompression off;", "writeCompression on;")
    open(cd, "w").write(txt)
    from foamtpu.apps.cli import main
    assert main(["blockMesh", "-case", dst]) == 0
    case = run_case(dst, max_steps=2)
    mesh = case.mesh
    t = case.time.name
    upath = os.path.join(dst, t, "U")
    assert os.path.exists(upath + ".gz")
    back = field_io.read_field(upath, mesh, name="U")
    np.testing.assert_allclose(
        np.asarray(back.data), np.asarray(case.final_state["U"].data),
        rtol=1e-6, atol=1e-8)
