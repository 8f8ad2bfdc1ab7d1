"""Per-op timing of the new work-list mesh path on TPU.

Times, per bounce depth: coherence sort, build_worklist, the winner
kernel, the analytic intersect kernel, and the full XLA bounce body.
Usage: PYTHONPATH=/root/repo python tools/profile_winner.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import camera as camera_mod
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops import rng
from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
    _winner_nodiff,
    build_worklist,
)
from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
    RAY_BLOCK,
    intersect_packed,
)
from raytracingthenextweekcuda_tpu.ops.rays import Rays
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import ray_sort_key


def timeit(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000, out


def main():
    print("device:", jax.devices()[0])
    scene, camera = presets.mesh_showcase(n_lat=64, n_lon=128)
    scene = finalize(scene)
    packed = scene.packed
    L = packed.leaf_bounds.shape[1]
    print("triangles:", int(scene.triangles.count), "leaves:", L)

    cfg = RenderConfig(width=256, height=256, spp=8, bounces=8,
                       spp_per_pass=4)
    S = 4
    frame = camera_mod.derive(camera, cfg.aspect_ratio)
    keys = jax.random.split(jax.random.key(0), S)
    n = cfg.num_pixels
    rays_l, ctx_l = [], []
    for s in range(S):
        r, c = camera_mod.generate_rays(frame, keys[s], cfg.width, cfg.height)
        rays_l.append(r)
        ctx_l.append(c)
    rays = Rays(
        origin=jnp.concatenate([r.origin for r in rays_l]),
        direction=jnp.concatenate([r.direction for r in rays_l]),
        time=jnp.concatenate([r.time for r in rays_l]),
    )
    pid = jnp.concatenate([c.pixel_id for c in ctx_l]).astype(jnp.int32)
    b0 = jnp.concatenate(
        [jnp.broadcast_to(c.base0, (n,)) for c in ctx_l]).astype(jnp.int32)
    b1 = jnp.concatenate(
        [jnp.broadcast_to(c.base1, (n,)) for c in ctx_l]).astype(jnp.int32)
    N = rays.count
    print(f"wavefront: {N} rays ({N // RAY_BLOCK} blocks)")

    lo = packed.bvh_bounds[0:3, 0]
    hi = packed.bvh_bounds[3:6, 0]
    state = (rays, jnp.ones((N, 3)), jnp.zeros((N, 3)), jnp.ones((N,), bool))

    trih_geom = packed.trih[:12]

    @jax.jit
    def wl(o, d, alive):
        return build_worklist(
            o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            alive.astype(jnp.int32), packed.leaf_bounds, tmin=float(cfg.tmin),
        )

    @jax.jit
    def winner(o, d, alive, counts, order):
        comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                 alive.astype(jnp.int32))
        return _winner_nodiff(
            (comps, counts, order, packed.leaf_bounds, packed.leaf_tiles,
             trih_geom),
            float(cfg.tmin), True, False,
        )

    @jax.jit
    def analytic(rays, alive):
        return intersect_packed(rays, packed, cfg.tmin, True, False,
                                alive=alive, include_triangles=False)

    @jax.jit
    def full_bounce(state, pid, b0, b1, bidx):
        ctx_b = rng.RayCtx(pid.astype(jnp.uint32), b0.astype(jnp.uint32),
                           b1.astype(jnp.uint32))
        return integrator._bounce_body(scene, cfg, state, ctx_b, bidx)

    @jax.jit
    def do_sort(state, pid, b0, b1):
        rays_b, tp, rad, alive = state
        key = ray_sort_key(
            rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
            rays_b.direction[:, 0], rays_b.direction[:, 1],
            rays_b.direction[:, 2], alive.astype(jnp.int32), lo, hi,
        )
        _, perm = jax.lax.sort(
            (key, jnp.arange(rays_b.count, dtype=jnp.int32)), num_keys=1)
        g = lambda a: jnp.take(a, perm, axis=0)
        return (
            (Rays(g(rays_b.origin), g(rays_b.direction), g(rays_b.time)),
             g(tp), g(rad), g(alive)),
            g(pid), g(b0), g(b1),
        )

    for bounce in range(4):
        rays_b, tp, rad, alive = state
        alive_n = int(np.asarray(alive.sum()))
        if bounce > 0:
            dt_s, out = timeit(lambda: do_sort(state, pid, b0, b1))
            state, pid, b0, b1 = out
            rays_b, tp, rad, alive = state
        else:
            dt_s = 0.0
        dt_w, (counts, order) = timeit(
            lambda: wl(rays_b.origin, rays_b.direction, alive))
        cnts = np.asarray(counts)[:, 0, 0]
        dt_k, _ = timeit(
            lambda: winner(rays_b.origin, rays_b.direction, alive,
                           counts, order))
        dt_a, _ = timeit(lambda: analytic(rays_b, alive))
        dt_f, new_state = timeit(
            lambda: full_bounce(state, pid, b0, b1, jnp.uint32(bounce)))
        print(f"bounce {bounce}: sort {dt_s:6.2f}  worklist {dt_w:6.2f}  "
              f"winner {dt_k:7.2f}  analytic {dt_a:6.2f}  "
              f"fullbounce {dt_f:7.2f} ms | alive {alive_n} "
              f"tiles/blk mean {cnts.mean():.1f} max {cnts.max()}")
        state = new_state


if __name__ == "__main__":
    main()
