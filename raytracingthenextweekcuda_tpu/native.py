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
            _LIB = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def build_sah_bvh(triangles):
    """Native binned-SAH build -> ops.bvh.BVH (same contract as build_bvh).

    Raises RuntimeError if the native library is absent or the build fails.
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
    return BVH(
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        node_lo=jnp.asarray(node_lo),
        node_hi=jnp.asarray(node_hi),
        tri_order=jnp.asarray(tri_order),
        range_first=jnp.asarray(range_first),
        range_last=jnp.asarray(range_last),
    )
