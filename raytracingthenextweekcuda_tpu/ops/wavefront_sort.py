"""Wavefront sorting: spatially coherent ray blocks for the tile-BVH path.

The megastep's block-consensus traversal (ops/bvh_tile.py) visits a BVH
node when ANY ray of a 1024-ray VMEM block hits its bound. Primary rays are
coherent (consecutive pixels), but after one diffuse bounce a block's rays
scatter over the whole scene and the consensus degenerates to visiting
nearly every leaf tile — the same divergence the reference's per-thread
SIMT traversal suffers from warp-wide (CUDAPathTracer.cu:192-352), at 128x
the width.

The fix is the classic wavefront-sorting move, shaped for XLA: between
bounces, sort the planar ray state by a single int32 key

    alive ? (direction octant << 27) | morton9^3(origin in root AABB)
          : 0x7FFFFFFF

so rays that start near each other AND head the same way land in the same
block (consensus skips almost everything), while dead rays sort to the tail
and terminate whole blocks (the kernel's per-block early-out makes that a
pass-through copy — compaction for free, no dynamic shapes).

Because every random draw is a pure function of (pixel_id, key, bounce)
(ops/rng.py) and pixel_id rides the sort, the sorted render is
bit-identical to the unsorted one. ONE multi-operand `lax.sort` call moves
the whole 14-tuple state + ids in a single fused sort; argsort + 16 gathers
would serialize on TPU's slow per-lane gather path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Dead-ray key: int32 max, sorts after every live key. Live keys span the
# full 31 value bits (miss_root<<30 | octant<<27 | morton27) so ray_sort_key
# clamps them to DEAD_KEY-1 — the sorted key doubles as the alive mask
# (key != DEAD_KEY) downstream.
DEAD_KEY = 0x7FFFFFFF


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x two apart: b9..b0 -> b9 0 0 b8 0 0 ... b0."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_key(ox, oy, oz, dx, dy, dz, alive, lo, hi) -> jnp.ndarray:
    """int32 coherence key per ray (see module docstring).

    lo/hi: (3,) root AABB of the tile-BVH — positions are quantized to a
    512^3 grid inside it (clipped, so rays outside the box still sort
    sensibly to the nearest face).

    Bit 30 marks rays whose slab test MISSES the root box: they still
    need analytic-primitive intersection but are dead to the winner
    kernel (ops/fused.py's mesh-needed mask), so clustering them makes
    whole blocks mesh-skippable — the wavefront analogue of the
    reference's mesh AABB early-out (TriangleMesh.cu:35-37).
    """
    f32 = jnp.float32
    span = jnp.maximum((hi - lo).astype(f32), 1e-12)

    def quant(p, axis):
        g = (p - lo[axis]) * (512.0 / span[axis])
        return jnp.clip(g, 0.0, 511.0).astype(jnp.int32)

    m = (
        (_part1by2(quant(ox, 0)) << 2)
        | (_part1by2(quant(oy, 1)) << 1)
        | _part1by2(quant(oz, 2))
    )
    octant = (
        ((dx < 0.0).astype(jnp.int32) << 2)
        | ((dy < 0.0).astype(jnp.int32) << 1)
        | (dz < 0.0).astype(jnp.int32)
    )
    import os

    # Refine each octant by quantizing |direction| components (2 extra
    # bits per axis ahead of the position morton): tighter directional
    # clustering shrinks the per-block leaf lists more than the 6
    # sacrificed position bits grow them — measured on the materialball
    # stress bench (v5e, 512x512x32spp, leaf 768): dirbits 0 = 4643 ms,
    # dirbits 2 = 4500 ms, listed leaves/block 21.7 -> 14.9 at bounce 1.
    # Baked at trace time (run sweeps in a fresh process); RTNW_KEY_DIRBITS
    # overrides, 0 disables.
    extra_dir = int(os.environ.get("RTNW_KEY_DIRBITS", "2"))
    if extra_dir:
        for axis_d in (dx, dy, dz):
            q = jnp.clip(
                (jnp.abs(axis_d) * (1 << extra_dir)).astype(jnp.int32),
                0, (1 << extra_dir) - 1,
            )
            octant = (octant << extra_dir) | q
        m = m >> (3 * extra_dir)
    eps = 1e-20
    rtn = None
    rtf = None
    for o_c, d_c, a in ((ox, dx, 0), (oy, dy, 1), (oz, dz, 2)):
        da = jnp.where(jnp.abs(d_c) < eps,
                       jnp.where(d_c >= 0.0, eps, -eps), d_c)
        inv = 1.0 / da
        t0 = (lo[a] - o_c) * inv
        t1 = (hi[a] - o_c) * inv
        tnn = jnp.minimum(t0, t1)
        tff = jnp.maximum(t0, t1)
        rtn = tnn if rtn is None else jnp.maximum(rtn, tnn)
        rtf = tff if rtf is None else jnp.minimum(rtf, tff)
    miss_root = ((rtf < rtn) | (rtf < 0.0)).astype(jnp.int32)
    key = (miss_root << 30) | (octant << (27 - 3 * extra_dir)) | m
    # A root-missing all-negative-octant ray clip-quantized to 511 on all
    # axes would hit exactly DEAD_KEY; clamp so live keys stay strictly
    # below the sentinel (consumers reconstruct alive as key != DEAD_KEY).
    key = jnp.minimum(key, jnp.int32(DEAD_KEY - 1))
    return jnp.where(alive != 0, key, jnp.int32(DEAD_KEY))


def sort_wavefront(state, pid, slot, lo, hi, extras=()):
    """Sort the 14-tuple planar bounce state (+ pixel id, + original slot,
    + any extra per-ray rows) by the coherence key, in ONE lax.sort call.

    state:  (ox, oy, oz, dx, dy, dz, tm, alive, tpx, tpy, tpz, rx, ry, rz)
    pid:    (N,) int32 pixel id (drives the counter RNG — order-independent)
    slot:   (N,) int32 original wavefront position (for the final unsort)
    extras: tuple of (N,) arrays that ride along (e.g. per-ray RNG key words
            when several spp share one multi-sample wavefront)
    """
    ox, oy, oz, dx, dy, dz, tm, alive = state[:8]
    key = ray_sort_key(ox, oy, oz, dx, dy, dz, alive, lo, hi)
    out = jax.lax.sort((key, *state, pid, slot, *extras), num_keys=1)
    return out[1:15], out[15], out[16], tuple(out[17:])


def unsort_radiance(slot, rx, ry, rz, n: int) -> jnp.ndarray:
    """Restore pixel order: sort radiance rows by original slot index.

    A key-sort is the TPU-friendly inverse permutation (scatter/gather by
    index serialize per lane). Returns (n, 3) radiance.
    """
    _, rxs, rys, rzs = jax.lax.sort((slot, rx, ry, rz), num_keys=1)
    return jnp.stack([rxs[:n], rys[:n], rzs[:n]], axis=-1)


__all__ = ["ray_sort_key", "sort_wavefront", "unsort_radiance", "DEAD_KEY"]
