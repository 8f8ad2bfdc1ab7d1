"""Consensus waste vs block size and multi-sample wavefronts.

sim_consensus showed: per-ray exact need is ~2-4 leaf tiles, but a sorted
1024-ray block's union covers ~80-120 of 128 tiles — the block is spatially
too large after one diffuse bounce. Two levers:
  (a) multi-sample wavefronts: S samples sorted together make each block
      cover an S x smaller region at the same ray count;
  (b) sub-block consensus: skip leaf tiles per row (128 rays) instead of
      per block (1024).
This sim measures leaf visits/ray for block sizes {1024, 256, 128} x
S in {1, 4} on real bounce-1/2 ray states. Pure numpy/CPU.

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/sim_consensus2.py
"""

import numpy as np
import jax.numpy as jnp

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import presets
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops import bvh_tile
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import ray_sort_key
from tools.sim_consensus import bounce_states, slab


def main():
    scene, camera = presets.mesh_showcase(n_lat=64, n_lon=128)
    scene = finalize(scene)
    bounds = np.asarray(scene.packed.bvh_bounds)
    meta = np.asarray(scene.packed.bvh_meta)
    leaves = np.nonzero(meta[0] == 1)[0]
    lo_all = bounds[0:3].T
    hi_all = bounds[3:6].T
    lo, hi = bounds[0:3, 0], bounds[3:6, 0]
    cfg = RenderConfig(width=256, height=256, spp=1, bounces=8)

    # S "samples" = states from S different seeds, concatenated.
    all_states = {}
    for s, seed in enumerate([1984, 7, 42, 1234]):
        c = RenderConfig(width=256, height=256, spp=1, bounces=8, seed=seed)
        all_states[s] = bounce_states(scene, camera, c, n_bounces=3)

    for b in (1, 2):
        for S in (1, 4):
            o = np.concatenate([all_states[s][b][0] for s in range(S)])
            d = np.concatenate([all_states[s][b][1] for s in range(S)])
            alive = np.concatenate([all_states[s][b][2] for s in range(S)])
            best_t = np.concatenate([all_states[s][b][3] for s in range(S)])
            key = np.asarray(ray_sort_key(
                jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]),
                jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
                jnp.asarray(alive.astype(np.int32)), jnp.asarray(lo),
                jnp.asarray(hi)))
            order = np.argsort(key, kind="stable")
            o, d, alive, best_t = o[order], d[order], alive[order], best_t[order]
            hit_l, tn_l = slab(o, d, lo_all[leaves], hi_all[leaves], cfg.tmin, None)
            need = hit_l & (tn_l < best_t[:, None]) & alive[:, None]
            n = o.shape[0]
            for block in (1024, 256, 128):
                visits = 0
                live_blocks = 0
                for st in range(0, n, block):
                    nb = need[st:st + block]
                    if not alive[st:st + block].any():
                        continue
                    live_blocks += 1
                    visits += np.count_nonzero(nb.any(0))
                tot_rays = alive.sum()
                print(f"bounce {b} S={S} block={block:5d}: "
                      f"union visits/live-block {visits/max(live_blocks,1):6.1f} "
                      f"| leaf-tile evals/live-ray "
                      f"{visits*block/max(tot_rays,1):6.1f} "
                      f"| live blocks {live_blocks}/{(n+block-1)//block}")
        print()


if __name__ == "__main__":
    main()
