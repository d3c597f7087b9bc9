"""Native C++ IO/geometry accelerator (native/foamtpu_io.cpp via
io/native.py ctypes; reference: src/OpenFOAM/db/IOstreams/ +
primitiveMeshFaceCentresAndAreas.C). Every function must agree
bit-for-bit with the pure-Python fallback it replaces."""

import os

import numpy as np
import pytest

from foamtpu.core.dictionary import parse_string
from foamtpu.io import native as nio
from foamtpu.io import polymesh as mesh_io
from foamtpu.mesh import blockmesh
from foamtpu.mesh import core as mc

BOX = """
convertToMeters 1;
vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
           (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (6 5 4) simpleGrading (1 1 1) );
boundary ( walls { type wall; faces ((2 6 5 1) (0 4 7 3) (1 5 4 0)
                                     (3 7 6 2) (0 3 2 1) (4 5 6 7)); } );
"""

pytestmark = pytest.mark.skipif(nio.lib() is None,
                                reason="native toolchain unavailable")


def test_parse_matches_python():
    body = " 1.5 -2e3 (0.25 1 2)\n 7 // footer\n"
    nat = nio.parse_doubles(body)
    ref = np.fromstring(body.replace("(", " ").replace(")", " ")
                        .replace("// footer", " "), sep=" ")
    np.testing.assert_array_equal(nat, ref)
    ints = nio.parse_longs(" 3 -4 (5 6) 7 ")
    np.testing.assert_array_equal(ints, [3, -4, 5, 6, 7])


def test_parse_faces_mixed_sizes():
    body = "3(0 1 2) 4(3 4 5 6) 3(7 8 9)"
    fp, fn = nio.parse_faces(body)
    np.testing.assert_array_equal(fn, [3, 4, 3])
    np.testing.assert_array_equal(fp[0], [0, 1, 2, -1])
    np.testing.assert_array_equal(fp[1], [3, 4, 5, 6])
    np.testing.assert_array_equal(fp[2], [7, 8, 9, -1])


def test_polymesh_roundtrip_native_vs_python(tmp_path):
    pm = blockmesh.generate(parse_string(BOX))
    d_nat = str(tmp_path / "nat")
    mesh_io.write(pm, d_nat)            # native writers
    pm2 = mesh_io.read(d_nat)           # native parsers (small -> may
    np.testing.assert_array_equal(pm2.face_pts, pm.face_pts)
    np.testing.assert_array_equal(pm2.owner, pm.owner)
    np.testing.assert_array_equal(pm2.neighbour, pm.neighbour)
    np.testing.assert_allclose(pm2.points, pm.points, rtol=0, atol=0)
    # cross-check: files written by the native path re-read by the
    # pure-Python parser give the identical mesh
    os.environ["FOAMTPU_NATIVE_IO"] = "0"
    try:
        nio._TRIED, nio._LIB = True, None
        pm3 = mesh_io.read(d_nat)
        np.testing.assert_array_equal(pm3.face_pts, pm.face_pts)
        np.testing.assert_allclose(pm3.points, pm.points, rtol=0,
                                   atol=0)
        np.testing.assert_allclose(pm3.v, pm.v, rtol=1e-14)
    finally:
        os.environ.pop("FOAMTPU_NATIVE_IO", None)
        nio._TRIED, nio._LIB = False, None


def test_face_geometry_bit_exact():
    pm = blockmesh.generate(parse_string(BOX))
    ctr_py, area_py = mc.face_centres_areas(pm.points, pm.face_pts,
                                            pm.face_npts)
    ctr_c, area_c = nio.face_geometry(pm.points, pm.face_pts,
                                      pm.face_npts)
    np.testing.assert_allclose(ctr_c, ctr_py, rtol=1e-13, atol=1e-16)
    np.testing.assert_allclose(area_c, area_py, rtol=1e-13,
                               atol=1e-16)


def test_face_geometry_polygon():
    """A planar pentagon: area vector equals the shoelace result."""
    th = np.linspace(0, 2 * np.pi, 6)[:-1]
    pts = np.stack([np.cos(th), np.sin(th), np.zeros(5)], axis=1)
    fp = np.arange(5, dtype=np.int64)[None, :]
    fn = np.asarray([5], np.int64)
    ctr, area = nio.face_geometry(pts, fp, fn)
    exact = 0.5 * 5 * np.sin(2 * np.pi / 5)   # regular pentagon r=1
    assert abs(area[0, 2] - exact) < 1e-12
    np.testing.assert_allclose(ctr[0], [0, 0, 0], atol=1e-12)
