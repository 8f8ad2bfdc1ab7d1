"""BVH sidecar cache.

The reference serializes its flattened BVH to `<mesh>.bvh` next to the model
and invalidates by file mtime (BVH.cpp:500-554). Here the cache is an .npz
keyed by a content hash of the triangle tensor — mtime lies, bytes don't —
stored either next to the mesh or under a cache dir.
"""

from __future__ import annotations

import hashlib
import os

import jax.numpy as jnp
import numpy as np

from raytracingthenextweekcuda_tpu.ops.bvh import BVH, build_bvh


def mesh_hash(vertices) -> str:
    arr = np.ascontiguousarray(np.asarray(vertices, np.float32))
    return hashlib.sha256(arr.tobytes()).hexdigest()[:16]


def cache_path_for(mesh_path: str, vertices) -> str:
    return f"{mesh_path}.{mesh_hash(vertices)}.bvh.npz"


def save_bvh(path: str, bvh: BVH) -> None:
    np.savez_compressed(
        path,
        left=np.asarray(bvh.left),
        right=np.asarray(bvh.right),
        node_lo=np.asarray(bvh.node_lo),
        node_hi=np.asarray(bvh.node_hi),
        tri_order=np.asarray(bvh.tri_order),
        range_first=np.asarray(bvh.range_first),
        range_last=np.asarray(bvh.range_last),
    )


def load_bvh(path: str) -> BVH:
    with np.load(path) as z:
        return BVH(
            left=jnp.asarray(z["left"]),
            right=jnp.asarray(z["right"]),
            node_lo=jnp.asarray(z["node_lo"]),
            node_hi=jnp.asarray(z["node_hi"]),
            tri_order=jnp.asarray(z["tri_order"]),
            range_first=jnp.asarray(z["range_first"]),
            range_last=jnp.asarray(z["range_last"]),
        )


# ---------------------------------------------------------------------------
# TileBVH sidecar cache (the production accel structure, ops/bvh_tile.py).
# The reference transparently caches <mesh>.bvh next to the model and
# invalidates by mtime (BVH.cpp:500-554); here the key is a content hash and
# the store lives under a writable cache dir (reference assets are mounted
# read-only), overridable with RTNW_BVH_CACHE (empty string disables).

def _tile_cache_dir() -> str | None:
    d = os.environ.get(
        "RTNW_BVH_CACHE", os.path.expanduser("~/.cache/rtnw_tpu")
    )
    return d or None


def save_tile_bvh(path: str, tb) -> None:
    np.savez_compressed(
        path, bounds=tb.bounds, meta=tb.meta, perm=tb.perm
    )


def load_tile_bvh(path: str):
    from raytracingthenextweekcuda_tpu.ops.bvh_tile import TileBVH

    with np.load(path) as z:
        return TileBVH(
            bounds=z["bounds"], meta=z["meta"], perm=z["perm"]
        )


def build_or_load_tile_bvh(vertices: np.ndarray, leaf_size: int = 128):
    """TileBVH for `vertices`, consulting the content-hash cache.

    Build preference: native binned-SAH tile derivation
    (ops/bvh_tile.build_tile_bvh_sah) when librtnw_native.so is present,
    else the numpy median split. The cache key includes the builder so a
    native build never serves a median-split artifact or vice versa.
    """
    from raytracingthenextweekcuda_tpu import native
    from raytracingthenextweekcuda_tpu.ops.bvh_tile import (
        build_tile_bvh,
        build_tile_bvh_sah,
    )

    use_sah = native.available()
    cache_dir = _tile_cache_dir()
    path = None
    if cache_dir is not None:
        tag = "sah" if use_sah else "med"
        path = os.path.join(
            cache_dir,
            f"tile_{tag}{leaf_size}_{mesh_hash(vertices)}.npz",
        )
        if os.path.exists(path):
            try:
                return load_tile_bvh(path)
            except Exception:
                pass  # corrupt cache -> rebuild
    tb = (build_tile_bvh_sah(vertices, leaf_size) if use_sah
          else build_tile_bvh(vertices, leaf_size))
    if path is not None:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            save_tile_bvh(path, tb)
        except OSError:
            pass  # unwritable cache dir -> skip caching
    return tb


def build_or_load(triangles, mesh_path: str | None = None) -> BVH:
    """Build the LBVH, consulting the sidecar cache when a path is given."""
    if mesh_path is None:
        return build_bvh(triangles)
    path = cache_path_for(mesh_path, triangles.vertices)
    if os.path.exists(path):
        try:
            return load_bvh(path)
        except Exception:
            pass  # corrupt cache -> rebuild
    bvh = build_bvh(triangles)
    try:
        save_bvh(path, bvh)
    except OSError:
        pass  # read-only location -> skip caching
    return bvh
