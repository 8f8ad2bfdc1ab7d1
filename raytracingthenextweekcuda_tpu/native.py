"""ctypes bindings for the native C++ components.

`build_sah_bvh` is the native counterpart of ops/bvh.build_bvh: a binned-SAH
builder (better tree quality than LBVH — fewer node visits per ray) filling
the exact same flat-array contract, so traversal code is builder-agnostic.
Falls back cleanly when the shared library hasn't been built:
    cmake -S native -B native/build -G Ninja && ninja -C native/build
"""

from __future__ import annotations

import ctypes
import os

import jax.numpy as jnp
import numpy as np

_LIB = None
_SEARCH = [
    os.path.join(os.path.dirname(__file__), "..", "native", "build", "lib"),
    os.path.join(os.path.dirname(__file__), "..", "native", "build"),
]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for d in _SEARCH:
        path = os.path.join(d, "librtnw_native.so")
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.rtnw_build_sah_bvh.restype = ctypes.c_int32
            lib.rtnw_build_sah_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            if hasattr(lib, "rtnw_load_mesh"):  # older .so without loaders
                lib.rtnw_load_mesh.restype = ctypes.c_int64
                lib.rtnw_load_mesh.argtypes = [
                    ctypes.c_char_p, ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_float,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                    ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
                ]
                lib.rtnw_mesh_read.restype = ctypes.c_int32
                lib.rtnw_mesh_read.argtypes = [
                    ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
                ]
                lib.rtnw_last_error.restype = ctypes.c_char_p
            _LIB = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def build_sah_bvh(triangles, to_jnp: bool = True):
    """Native binned-SAH build -> ops.bvh.BVH (same contract as build_bvh).

    `to_jnp=False` keeps the arrays as host numpy (used by the tile-BVH
    deriver, which walks the tree on the host). Raises RuntimeError if the
    native library is absent or the build fails.
    """
    from raytracingthenextweekcuda_tpu.ops.bvh import BVH

    lib = _load()
    if lib is None:
        raise RuntimeError(
            "librtnw_native.so not built; run: "
            "cmake -S native -B native/build -G Ninja && ninja -C native/build"
        )
    verts = np.ascontiguousarray(np.asarray(triangles.vertices), np.float32)
    t = verts.shape[0]
    if t < 2:
        raise ValueError("need >= 2 triangles")
    i_n = t - 1
    left = np.empty(i_n, np.int32)
    right = np.empty(i_n, np.int32)
    node_lo = np.empty((2 * t - 1, 3), np.float32)
    node_hi = np.empty((2 * t - 1, 3), np.float32)
    tri_order = np.empty(t, np.int32)
    range_first = np.empty(i_n, np.int32)
    range_last = np.empty(i_n, np.int32)

    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    depth = lib.rtnw_build_sah_bvh(
        fp(verts), t, ip(left), ip(right), fp(node_lo), fp(node_hi),
        ip(tri_order), ip(range_first), ip(range_last),
    )
    if depth <= 0:
        raise RuntimeError(f"native SAH build failed (code {depth})")
    conv = jnp.asarray if to_jnp else (lambda a: a)
    return BVH(
        left=conv(left),
        right=conv(right),
        node_lo=conv(node_lo),
        node_hi=conv(node_hi),
        tri_order=conv(tri_order),
        range_first=conv(range_first),
        range_last=conv(range_last),
    )


def loaders_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "rtnw_load_mesh")


def _load_mesh(path: str, kind: int, scale, rotate_y: float, offset,
               normalize: bool, max_coord: float) -> np.ndarray:
    """Native mesh parse + transform -> (T, 3, 3) f32 triangles.

    The C++ counterpart of io/obj.load_obj (kind=0) and io/ply.load_ply
    (kind=1) — same transforms, single-pass tokenizer, plus
    binary_little_endian PLY support the Python parser lacks.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "rtnw_load_mesh"):
        raise RuntimeError(
            "librtnw_native.so not built (or stale); run: "
            "cmake -S native -B native/build -G Ninja && ninja -C native/build"
        )
    sc = np.asarray(scale, np.float32).reshape(3)
    off = np.asarray(offset, np.float32).reshape(3)
    count = ctypes.c_int32(0)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    handle = lib.rtnw_load_mesh(
        path.encode(), kind, fp(sc), float(rotate_y), fp(off),
        1 if normalize else 0, float(max_coord), ctypes.byref(count),
    )
    if handle < 0:
        raise ValueError(
            f"{path}: {lib.rtnw_last_error().decode(errors='replace')}"
        )
    tris = np.empty((count.value, 3, 3), np.float32)
    if lib.rtnw_mesh_read(handle, fp(tris)) != 0:
        raise RuntimeError(lib.rtnw_last_error().decode(errors="replace"))
    return tris


def load_obj_native(path: str, scale=(1.0, 1.0, 1.0), rotate=(0.0, 0.0, 0.0),
                    offset=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Native OBJ load: v *= scale; rotateY(v); v += offset
    (ModelLoader.cpp:438-445 — only rotate.y is used, like the reference)."""
    rot_y = float(np.asarray(rotate, np.float32).reshape(3)[1])
    return _load_mesh(path, 0, scale, rot_y, offset, False, 1.0)


def load_ply_native(path: str, offset=(0.0, 0.0, 0.0), normalize: bool = True,
                    max_coord: float = 1.0) -> np.ndarray:
    """Native PLY load (ascii or binary_little_endian) with the reference's
    center/unit-scale/offset normalization (Loader.cpp:104-150)."""
    return _load_mesh(path, 1, (1.0, 1.0, 1.0), 0.0, offset, normalize,
                      max_coord)
