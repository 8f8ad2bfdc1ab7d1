"""Tile-BVH: a TPU-shaped acceleration structure for the bounce megastep.

Why not the classic per-ray stack traversal (BVH.cpp:94-333 build +
CUDAPathTracer.cu:192-352 device stacks)? TPU vector lanes cannot gather:
per-ray node indices would serialize into scalar loops (the pure-XLA
traversal in ops/traverse.py profiles at 0.01 M paths/s on a v5e — 200x
slower than the reference GPU). The TPU-native formulation inverts the
loop: ALL rays of a 1024-ray block walk the SAME node sequence (scalar
control flow, node AABBs as scalars in SMEM), each node is slab-tested
vectorially against the whole block, and a subtree is skipped when NO ray
in the block hits its bound — block-consensus skipping via DFS skip
pointers ("threaded" BVH), the packet-traversal idea at 1024-wide TPU
scale.

Leaves are exactly one lane-tile: up to 128 triangles, padded, stored
contiguously so a leaf visit is ONE vectorized Möller–Trumbore tile
evaluation (rays (8,128,1) x triangles (1,1,128)) — the analogue of the
reference packing triangles in texture memory for coalesced fetches
(main.cu:334-343).

Build: binned-median split over the longest centroid axis (the quality/
speed middle ground between the reference's binned SAH, BVH.cpp:138-253,
and an LBVH), emitted in DFS preorder with skip = node_id + subtree_size.
Pure numpy, runs once at finalize; cacheable via io/bvh_cache.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

LEAF_SIZE = 128  # one lane-tile per leaf


class TileBVH(NamedTuple):
    """DFS skip-pointer BVH with lane-tile leaves (host-built, static)."""

    bounds: np.ndarray  # (6, M) f32: lo_x lo_y lo_z hi_x hi_y hi_z
    meta: np.ndarray    # (3, M) i32: is_leaf, leaf tile start (in triangles), skip node
    # Triangle permutation: perm[i] = original triangle index filling padded
    # slot i, -1 for padding (degenerate slot -> e1=e2=0 -> culled).
    perm: np.ndarray    # (n_leaves * LEAF_SIZE,) i32

    @property
    def n_nodes(self) -> int:
        return self.bounds.shape[1]

    @property
    def padded_tri_count(self) -> int:
        return self.perm.shape[0]


def build_tile_bvh(vertices: np.ndarray, leaf_size: int = LEAF_SIZE) -> TileBVH:
    """vertices: (T, 3, 3) float32 triangle vertices."""
    v = np.asarray(vertices, np.float32)
    T = v.shape[0]
    lo_t = v.min(axis=1)  # (T, 3)
    hi_t = v.max(axis=1)
    centroid = 0.5 * (lo_t + hi_t)

    bounds_list: list[np.ndarray] = []
    meta_list: list[list[int]] = []
    chunks: list[np.ndarray] = []

    def rec(idx: np.ndarray) -> int:
        """Emit the subtree over triangle indices `idx`; return its size."""
        node_id = len(meta_list)
        lo = lo_t[idx].min(axis=0)
        hi = hi_t[idx].max(axis=0)
        bounds_list.append(np.concatenate([lo, hi]))
        meta_list.append([0, 0, 0])  # placeholder
        if idx.size <= leaf_size:
            tile_start = len(chunks) * leaf_size
            chunk = np.full((leaf_size,), -1, np.int32)
            chunk[: idx.size] = idx
            chunks.append(chunk)
            meta_list[node_id] = [1, tile_start, 0]
            return 1
        c = centroid[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = idx.size // 2
        left, right = idx[order[:half]], idx[order[half:]]
        size = 1 + rec(left)
        size += rec(right)
        meta_list[node_id] = [0, 0, 0]
        meta_list[node_id].append(size)  # stash subtree size temporarily
        return size

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 64 + 2 * int(np.ceil(np.log2(max(T, 2)))) * 64))
    try:
        total = rec(np.arange(T, dtype=np.int64))
    finally:
        sys.setrecursionlimit(old_limit)

    M = len(meta_list)
    assert total == M
    bounds = np.stack(bounds_list, axis=1).astype(np.float32)  # (6, M)
    meta = np.zeros((3, M), np.int32)
    # skip = node_id + subtree size (leaves have size 1).
    for i, m in enumerate(meta_list):
        is_leaf = m[0]
        size = 1 if is_leaf else m[3]
        meta[0, i] = is_leaf
        meta[1, i] = m[1]
        meta[2, i] = i + size
    perm = (
        np.concatenate(chunks).astype(np.int32)
        if chunks else np.full((leaf_size,), -1, np.int32)
    )
    return TileBVH(bounds=bounds, meta=meta, perm=perm)


def build_tile_bvh_sah(vertices: np.ndarray,
                       leaf_size: int = LEAF_SIZE) -> TileBVH:
    """TileBVH whose split structure follows the native binned-SAH tree.

    The C++ builder (native/bvh_builder.cpp, the analogue of the
    reference's host SAH build BVH.cpp:94-333) produces a per-triangle
    binary tree with contiguous leaf ranges; this walks it top-down and
    cuts a lane-tile leaf at the first subtree with <= leaf_size triangles,
    so every 128-triangle tile is an SAH-clustered spatial group rather
    than a median-split one. Same DFS skip-pointer emission as
    build_tile_bvh. Raises RuntimeError when the native lib is absent.
    """
    from raytracingthenextweekcuda_tpu import native

    class _Tris:
        pass

    tris = _Tris()
    tris.vertices = np.asarray(vertices, np.float32)
    b = native.build_sah_bvh(tris, to_jnp=False)
    left, right = b.left, b.right
    node_lo, node_hi, tri_order = b.node_lo, b.node_hi, b.tri_order
    rf, rl = b.range_first, b.range_last
    i_n = left.shape[0]  # internal nodes; leaves are i_n + leaf_pos

    bounds_list: list[np.ndarray] = []
    meta_list: list[list[int]] = []  # [is_leaf, tile_start, skip]
    chunks: list[np.ndarray] = []

    # Iterative preorder with explicit finish markers (SAH trees can be
    # deep on degenerate inputs; no Python recursion).
    stack: list[tuple[str, int]] = [("visit", 0)]
    while stack:
        op, x = stack.pop()
        if op == "finish":
            meta_list[x][2] = len(meta_list)  # skip = past this subtree
            continue
        node_id = len(meta_list)
        bounds_list.append(
            np.concatenate([node_lo[x], node_hi[x]]).astype(np.float32)
        )
        if x >= i_n:
            first = last = x - i_n
        else:
            first, last = int(rf[x]), int(rl[x])
        count = last - first + 1
        if count <= leaf_size:
            tile_start = len(chunks) * leaf_size
            chunk = np.full((leaf_size,), -1, np.int32)
            chunk[:count] = tri_order[first : last + 1]
            chunks.append(chunk)
            meta_list.append([1, tile_start, node_id + 1])
        else:
            meta_list.append([0, 0, 0])
            stack.append(("finish", node_id))
            stack.append(("visit", int(right[x])))
            stack.append(("visit", int(left[x])))

    M = len(meta_list)
    bounds = np.stack(bounds_list, axis=1).astype(np.float32)
    meta = np.asarray(meta_list, np.int32).T.copy()
    perm = (
        np.concatenate(chunks).astype(np.int32)
        if chunks else np.full((leaf_size,), -1, np.int32)
    )
    assert meta.shape == (3, M)
    return TileBVH(bounds=bounds, meta=meta, perm=perm)


def permute_rows(rows: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """Reorder per-triangle planar rows (R, T) into leaf-tile order
    (R, n_leaves*LEAF_SIZE), zero-filling padded slots."""
    R = rows.shape[0]
    out = np.zeros((R, perm.shape[0]), rows.dtype)
    valid = perm >= 0
    out[:, valid] = np.asarray(rows)[:, perm[valid]]
    return out


__all__ = ["TileBVH", "build_tile_bvh", "build_tile_bvh_sah",
           "permute_rows", "LEAF_SIZE"]
