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


def permute_rows(rows: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """Reorder per-triangle planar rows (R, T) into leaf-tile order
    (R, n_leaves*LEAF_SIZE), zero-filling padded slots."""
    R = rows.shape[0]
    out = np.zeros((R, perm.shape[0]), rows.dtype)
    valid = perm >= 0
    out[:, valid] = np.asarray(rows)[:, perm[valid]]
    return out


__all__ = ["TileBVH", "build_tile_bvh", "permute_rows", "LEAF_SIZE"]
