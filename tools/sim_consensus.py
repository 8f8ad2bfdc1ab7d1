"""Simulate block-consensus tile-BVH traversal on real bounce-N ray states.

Answers: after sorting, how many leaf tiles does a 1024-ray block visit
(consensus = union over rays), vs what each ray actually needs (exact)?
This bounds the achievable win of per-ray masks / smarter traversal over
block consensus. Pure numpy; runs on CPU.

Usage: JAX_PLATFORMS=cpu python tools/sim_consensus.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingthenextweekcuda_tpu.config import INFINITY, RenderConfig
from raytracingthenextweekcuda_tpu.models import camera as cam_mod, integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops import rng
from raytracingthenextweekcuda_tpu.ops.bvh_tile import build_tile_bvh
from raytracingthenextweekcuda_tpu.ops.materials import scatter
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import ray_sort_key

BLOCK = 1024


def bounce_states(scene, camera, cfg, n_bounces=3):
    """Return per-bounce (origins, dirs, alive, best_t) via the XLA path."""
    frame = cam_mod.derive(camera, cfg.aspect_ratio)
    key = jax.random.key(cfg.seed)
    rays, ctx = cam_mod.generate_rays(frame, key, cfg.width, cfg.height)
    out = []
    alive = jnp.ones((rays.count,), bool)
    for b in range(n_bounces):
        hit = integrator.intersect_scene(scene, rays, cfg.tmin, INFINITY)
        out.append((np.asarray(rays.origin), np.asarray(rays.direction),
                    np.asarray(alive),
                    np.asarray(jnp.where(hit.valid, hit.t, np.float32(1e30)))))
        mat = scene.materials.gather(hit.material_id)
        u4 = rng.bounce_uniforms(ctx, b)
        sc = scatter(u4, rays, hit, mat, None)
        alive = alive & hit.valid & sc.scattered
        hp = rays.at(jnp.where(hit.valid, hit.t, 0.0))
        from raytracingthenextweekcuda_tpu.ops.rays import Rays
        rays = Rays(origin=jnp.where(alive[:, None], hp, rays.origin),
                    direction=jnp.where(alive[:, None], sc.direction, rays.direction),
                    time=rays.time)
    return out


def slab(o, d, lo, hi, tmin, tmax):
    """o,d: (N,3); lo,hi: (M,3). Returns (N,M) bool hit + (N,M) tn."""
    eps = 1e-20
    d = np.where(np.abs(d) < eps, np.where(d >= 0, eps, -eps), d)
    inv = 1.0 / d
    t0 = (lo[None] - o[:, None]) * inv[:, None]
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    return (tf >= tn) & (tf >= tmin), tn


def simulate(o, d, alive, best_t, bvh, tmin, label):
    n = o.shape[0]
    meta = bvh.meta
    leaves = np.nonzero(meta[0] == 1)[0]
    n_leaves = leaves.size
    lo_all = bvh.bounds[0:3].T
    hi_all = bvh.bounds[3:6].T

    # Exact per-ray requirement: leaf AABBs the ray enters before its hit.
    hit_l, tn_l = slab(o, d, lo_all[leaves], hi_all[leaves], tmin, None)
    need = hit_l & (tn_l < best_t[:, None]) & alive[:, None]  # (N, L)

    nodes_walked = 0
    leaf_visits = 0
    exact_union = 0
    dead_blocks = 0
    for s in range(0, n, BLOCK):
        bo, bd = o[s:s+BLOCK], d[s:s+BLOCK]
        ba, bt = alive[s:s+BLOCK], best_t[s:s+BLOCK].copy()
        if not ba.any():
            dead_blocks += 1
            continue
        exact_union += np.count_nonzero(need[s:s+BLOCK].any(0))
        # Skip-pointer DFS with consensus, best_t frozen (upper bound on
        # pruning uses final best_t — the kernel's running best_t is weaker).
        node = 0
        M = meta.shape[1]
        hit_n, tn_n = slab(bo, bd, lo_all, hi_all, tmin, None)
        while node < M:
            nodes_walked += 1
            node_hit = hit_n[:, node] & (tn_n[:, node] < bt) & ba
            any_hit = node_hit.any()
            if meta[0, node] == 1:
                if any_hit:
                    leaf_visits += 1
                node = meta[2, node]
            else:
                node = node + 1 if any_hit else meta[2, node]
    n_blocks = n // BLOCK
    live_blocks = n_blocks - dead_blocks
    print(f"{label}: blocks {live_blocks}/{n_blocks} live | "
          f"consensus leaf visits/block {leaf_visits/max(live_blocks,1):.1f} "
          f"| exact union/block {exact_union/max(live_blocks,1):.1f} "
          f"| of {n_leaves} leaves | nodes walked/block "
          f"{nodes_walked/max(live_blocks,1):.0f} of {meta.shape[1]} "
          f"| exact need/ray {need.sum(1)[alive].mean():.1f}")


def main():
    scene, camera = presets.mesh_showcase(n_lat=64, n_lon=128)
    scene = finalize(scene)
    tri_v = np.asarray(scene.triangles.vertices)
    valid = np.asarray(scene.triangles.mesh_id) >= 0
    # Rebuild the tile BVH on the already-permuted triangles to get node
    # arrays aligned with scene.packed (bounds/meta match pack order).
    from raytracingthenextweekcuda_tpu.ops import bvh_tile
    bvh = bvh_tile.TileBVH(
        bounds=np.asarray(scene.packed.bvh_bounds),
        meta=np.asarray(scene.packed.bvh_meta),
        perm=np.arange(tri_v.shape[0], dtype=np.int32),
    )
    cfg = RenderConfig(width=256, height=256, spp=1, bounces=8)
    states = bounce_states(scene, camera, cfg, n_bounces=3)
    lo = np.asarray(scene.packed.bvh_bounds[0:3, 0])
    hi = np.asarray(scene.packed.bvh_bounds[3:6, 0])
    meta = bvh.meta
    leaves = np.nonzero(meta[0] == 1)[0]
    lo_all = bvh.bounds[0:3].T
    hi_all = bvh.bounds[3:6].T
    for b, (o, d, alive, best_t) in enumerate(states):
        simulate(o, d, alive, best_t, bvh, cfg.tmin, f"bounce {b} unsorted")
        key = np.asarray(ray_sort_key(
            jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]),
            jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
            jnp.asarray(alive.astype(np.int32)), jnp.asarray(lo), jnp.asarray(hi),
        ))
        order = np.argsort(key, kind="stable")
        simulate(o[order], d[order], alive[order], best_t[order], bvh,
                 cfg.tmin, f"bounce {b} sorted  ")
        # Alternative key: nearest-hit leaf tile id (pruned by final best_t).
        hit_l, tn_l = slab(o, d, lo_all[leaves], hi_all[leaves], cfg.tmin, None)
        need = hit_l & (tn_l < best_t[:, None]) & alive[:, None]
        per_ray = need.sum(1)
        pct = np.percentile(per_ray[alive], [50, 90, 99, 99.9, 100])
        print(f"  per-ray tile need pct (50/90/99/99.9/max): {pct}")
        tn_masked = np.where(need, tn_l, np.inf)
        first = np.where(need.any(1), tn_masked.argmin(1), 1 << 20)
        first = np.where(alive, first, 1 << 21)
        order2 = np.argsort(first, kind="stable")
        simulate(o[order2], d[order2], alive[order2], best_t[order2], bvh,
                 cfg.tmin, f"bounce {b} tilesort")


if __name__ == "__main__":
    main()
