"""ctypes bindings for the native IO accelerator (native/
foamtpu_io.cpp — the C++ equivalent of the reference's
src/OpenFOAM/db/IOstreams/ token scanner).

The library is compiled on first use with g++ (cached next to the
source); every caller falls back to the pure-Python parser when the
toolchain or the build is unavailable, so the native path is a
transparent accelerator. Disable with FOAMTPU_NATIVE_IO=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "foamtpu_io.cpp")


def _build(src: str, out: str) -> bool:
    try:
        r = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
            capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(out)
    except (OSError, subprocess.TimeoutExpired):
        return False


def lib() -> Optional[ctypes.CDLL]:
    """The loaded accelerator, or None (Python fallback)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FOAMTPU_NATIVE_IO", "1") == "0":
            return None
        if not os.path.exists(_SRC):
            return None
        so = os.path.join(os.path.dirname(_SRC), "libfoamtpu_io.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            if not _build(_SRC, so):
                return None
        try:
            L = ctypes.CDLL(so)
        except OSError:
            return None
        LL, DP = ctypes.c_longlong, ctypes.POINTER(ctypes.c_double)
        LP = ctypes.POINTER(ctypes.c_longlong)
        CP = ctypes.c_char_p
        L.count_numbers.restype = LL
        L.count_numbers.argtypes = [CP, LL]
        L.parse_doubles.restype = LL
        L.parse_doubles.argtypes = [CP, LL, DP, LL]
        L.parse_longs.restype = LL
        L.parse_longs.argtypes = [CP, LL, LP, LL]
        L.split_faces.restype = LL
        L.split_faces.argtypes = [LP, LL, LP, LP, LP]
        L.write_label_list.restype = ctypes.c_int
        L.write_label_list.argtypes = [CP, CP, LP, LL]
        L.write_scalar_list.restype = ctypes.c_int
        L.write_scalar_list.argtypes = [CP, CP, DP, LL]
        L.write_vector_list.restype = ctypes.c_int
        L.write_vector_list.argtypes = [CP, CP, DP, LL]
        L.write_face_list.restype = ctypes.c_int
        L.write_face_list.argtypes = [CP, CP, LP, LP, LL, LL]
        L.face_geometry.restype = None
        L.face_geometry.argtypes = [DP, LP, LP, LL, LL, DP, DP]
        L.parse_doubles_off.restype = LL
        L.parse_doubles_off.argtypes = [CP, LL, DP, LL, LP]
        _LIB = L
        return _LIB


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _lp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))


def parse_doubles(text: str) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    raw = text.encode()
    n = L.count_numbers(raw, len(raw))
    out = np.empty(n, np.float64)
    got = L.parse_doubles(raw, len(raw), _dp(out), n)
    return out[:got]


def parse_longs(text: str) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    raw = text.encode()
    n = L.count_numbers(raw, len(raw))
    out = np.empty(n, np.int64)
    got = L.parse_longs(raw, len(raw), _lp(out), n)
    return out[:got]


def parse_faces(text: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """-> (face_pts padded with -1, face_npts) or None."""
    L = lib()
    if L is None:
        return None
    nums = parse_longs(text)
    if nums is None or nums.size == 0:
        return None
    total = nums.shape[0]
    counts = np.empty(total, np.int64)
    flat = np.empty(total, np.int64)
    mx = np.zeros(1, np.int64)
    nf = L.split_faces(_lp(np.ascontiguousarray(nums)), total,
                       _lp(counts), _lp(flat), _lp(mx))
    if nf < 0:
        return None
    counts = counts[:nf]
    max_pts = int(mx[0]) if nf else 3
    out = np.full((nf, max_pts), -1, np.int64)
    # scatter the flat stream into the padded table (vectorised):
    # boolean fill order is row-major, matching the flat layout
    cols = np.arange(max_pts)[None, :]
    mask = cols < counts[:, None]
    out[mask] = flat[:counts.sum()]
    return out, counts


def write_label_list(path: str, header: str, v: np.ndarray) -> bool:
    L = lib()
    if L is None:
        return False
    a = np.ascontiguousarray(v, np.int64)
    return L.write_label_list(path.encode(), header.encode(), _lp(a),
                              a.shape[0]) == 0


def write_vector_list(path: str, header: str, v: np.ndarray) -> bool:
    L = lib()
    if L is None:
        return False
    a = np.ascontiguousarray(v, np.float64)
    return L.write_vector_list(path.encode(), header.encode(), _dp(a),
                               a.shape[0]) == 0


def write_face_list(path: str, header: str, face_pts: np.ndarray,
                    face_npts: np.ndarray) -> bool:
    L = lib()
    if L is None:
        return False
    fp = np.ascontiguousarray(face_pts, np.int64)
    fn = np.ascontiguousarray(face_npts, np.int64)
    return L.write_face_list(path.encode(), header.encode(), _lp(fp),
                             _lp(fn), fp.shape[0], fp.shape[1]) == 0


def face_geometry(points: np.ndarray, face_pts: np.ndarray,
                  face_npts: np.ndarray
                  ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native face centres + area vectors (reference:
    primitiveMeshFaceCentresAndAreas.C); None -> NumPy fallback."""
    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    fp = np.ascontiguousarray(face_pts, np.int64)
    fn = np.ascontiguousarray(face_npts, np.int64)
    n, mx = fp.shape
    ctr = np.empty((n, 3), np.float64)
    area = np.empty((n, 3), np.float64)
    L.face_geometry(_dp(pts), _lp(fp), _lp(fn), n, mx, _dp(ctr),
                    _dp(area))
    return ctr, area


def parse_doubles_n(text: str, n: int
                    ) -> Optional[Tuple[np.ndarray, int]]:
    """Parse exactly n doubles from the start of text; returns
    (values, consumed_chars) or None. The consumed offset lets the
    field fast path cut the big list out of the file text."""
    L = lib()
    if L is None:
        return None
    raw = text.encode()
    out = np.empty(n, np.float64)
    off = np.zeros(1, np.int64)
    got = L.parse_doubles_off(raw, len(raw), _dp(out), n, _lp(off))
    if got != n:
        return None
    return out, int(off[0])
