"""Native C++ fast paths (marching tetrahedra, mesh raycasting).

The extension builds lazily with g++ on first use and is cached next to the
sources. Every entry point has a NumPy fallback in geometry/, so the package
works (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "_native.so")
_SRC = os.path.join(_DIR, "native.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        "-o", _LIB_PATH, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise ImportError("native build previously failed")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            try:
                _build()
            except Exception as e:  # noqa: BLE001
                _build_failed = True
                raise ImportError(f"native build failed: {e}") from e
        lib = ctypes.CDLL(_LIB_PATH)
        lib.marching_tets.restype = ctypes.c_longlong
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_longlong)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.free_buffers.restype = None
        lib.free_buffers.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.points_occupancy.restype = None
        lib.points_occupancy.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.smooth_simple.restype = None
        lib.smooth_simple.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.write_obj.restype = ctypes.c_longlong
        lib.write_obj.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
        ]
        _lib = lib
        return lib


def native_marching_tetrahedra(grid: np.ndarray, iso: float = 0.0):
    from ishapediting_tpu.geometry.mesh import TriMesh

    if grid.size > 2**31 - 1:
        # the C++ edge key packs two flat voxel indices into 32 bits each
        # (native.cpp::edge_vertex); a larger grid would silently collide.
        # Raising sends grid_to_mesh to the int64-keyed NumPy path. Checked
        # BEFORE ascontiguousarray so a non-contiguous oversize grid is
        # never copied just to be rejected.
        raise ValueError(
            f"grid size {grid.size} exceeds the native 32-bit edge-key bound"
        )
    lib = get_lib()
    g = np.ascontiguousarray(grid, dtype=np.float32)
    verts_ptr = ctypes.POINTER(ctypes.c_double)()
    tris_ptr = ctypes.POINTER(ctypes.c_longlong)()
    nv = ctypes.c_longlong(0)
    nf = ctypes.c_longlong(0)
    rc = lib.marching_tets(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g.shape[0], g.shape[1], g.shape[2],
        ctypes.c_float(iso),
        ctypes.byref(verts_ptr), ctypes.byref(tris_ptr),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        raise RuntimeError("native marching_tets failed")
    try:
        verts = np.ctypeslib.as_array(verts_ptr, shape=(nv.value, 3)).copy()
        tris = np.ctypeslib.as_array(tris_ptr, shape=(nf.value, 3)).copy()
    finally:
        lib.free_buffers(
            ctypes.cast(verts_ptr, ctypes.c_void_p),
            ctypes.cast(tris_ptr, ctypes.c_void_p),
        )
    return TriMesh(verts, tris)


def native_smooth_simple(
    vertices: np.ndarray, triangles: np.ndarray, iterations: int
) -> np.ndarray:
    """C++ filter_smooth_simple (unique-neighbor Laplacian); returns new
    [n,3] f64 vertices. Fallback: the scipy-CSR path in geometry/mesh.py."""
    lib = get_lib()
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    t = np.ascontiguousarray(triangles, dtype=np.int64)
    out = np.empty_like(v)
    lib.smooth_simple(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), len(t),
        int(iterations),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def native_write_obj(
    vertices: np.ndarray, triangles: np.ndarray, path: str
) -> None:
    """Buffered C++ ascii OBJ writer; byte-identical to the Python writer
    ("%.8g" vertices, 1-based faces). Fallback: _write_obj in geometry/mesh."""
    lib = get_lib()
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    t = np.ascontiguousarray(triangles, dtype=np.int64)
    rc = lib.write_obj(
        os.fsencode(path),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), len(t),
    )
    if rc != 0:
        raise OSError(f"native write_obj failed (rc={rc}): {path}")


def native_points_occupancy(mesh, points: np.ndarray) -> np.ndarray:
    lib = get_lib()
    v = np.ascontiguousarray(mesh.vertices, dtype=np.float64)
    t = np.ascontiguousarray(mesh.triangles, dtype=np.int64)
    p = np.ascontiguousarray(points, dtype=np.float64)
    out = np.zeros(len(p), dtype=np.float64)
    lib.points_occupancy(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), len(t),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
