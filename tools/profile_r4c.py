"""Calibrate axon dispatch overhead + measure the real mesh chunk time.

1. trivial jitted op timed with the same loop as profile_r4 -> overhead floor
2. one real render_pass (16-spp chunk) of the mesh bench -> ground truth
3. sort phase alone, x4 chained INSIDE one jit (single dispatch)
4. winner phase alone, x4 chained INSIDE one jit
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
from raytracingthenextweekcuda_tpu.models import integrator
from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
    intersect_packed_bvh,
)
from raytracingthenextweekcuda_tpu.ops.rays import Rays
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import DEAD_KEY, ray_sort_key

from tools.profile_r4 import load_scene


def sync(x):
    jax.tree_util.tree_map(
        lambda l: jax.block_until_ready(l)
        if hasattr(l, "block_until_ready") else l, x)


def timeit(fn, reps=5):
    out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("device:", jax.devices()[0])
    scene, camera = load_scene()
    packed = scene.packed

    # 1. dispatch overhead floor
    x = jnp.zeros((128,), jnp.float32)
    f_triv = jax.jit(lambda x: x + 1.0)
    dt = timeit(lambda: f_triv(x))
    print(f"trivial dispatch : {dt*1e3:8.2f} ms")

    # 2. ground truth: BENCH_r03 full mesh bench = 7581.7 ms (2 chunks of
    #    16 spp: 10 bounces + 9 sorts each). Skipped here — the full
    #    render program takes minutes to compile through the relay.
    cfg = RenderConfig(width=512, height=512, spp=16, bounces=10,
                       spp_per_pass=16)

    # Build a depth-2 wavefront for phase timing (reuse r4's approach
    # cheaply: primaries + 2 bounces via _trace internals is heavy; instead
    # synthesize a scattered wavefront: origins on mesh surface region,
    # random directions -> worst-case-ish coherence after sort).
    S = 16
    frame = camera_mod.derive(camera, cfg.aspect_ratio)
    keys = jax.random.split(jax.random.key(0), S)
    n = cfg.num_pixels
    rays_l = []
    for s in range(S):
        r, c = camera_mod.generate_rays(frame, keys[s], cfg.width, cfg.height)
        rays_l.append(r)
    rays = Rays(
        origin=jnp.concatenate([r.origin for r in rays_l]),
        direction=jnp.concatenate([r.direction for r in rays_l]),
        time=jnp.concatenate([r.time for r in rays_l]),
    )
    N = rays.count
    lo = packed.bvh_bounds[0:3, 0]
    hi = packed.bvh_bounds[3:6, 0]
    alive = jnp.ones((N,), bool)

    # 3. sort x4 inside one jit
    @jax.jit
    def sort4(rays_b, alive, extra):
        o, d, tm = rays_b.origin, rays_b.direction, rays_b.time
        rows = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tm] + [
            extra[:, i] for i in range(6)] + [
            jnp.arange(N, dtype=jnp.int32)] * 4
        for it in range(4):
            key = ray_sort_key(rows[0], rows[1], rows[2], rows[3], rows[4],
                               rows[5], alive.astype(jnp.int32), lo, hi)
            out = jax.lax.sort((key, *rows), num_keys=1, is_stable=False)
            rows = list(out[1:])
            alive = out[0] != DEAD_KEY
        return rows[0], alive

    extra = jnp.ones((N, 6), jnp.float32)
    dt = timeit(lambda: sort4(rays, alive, extra), reps=3)
    print(f"sort x4 (17 ops) : {dt*1e3:8.2f} ms total -> {dt/4*1e3:8.2f} ms/sort")

    # 4. winner x4 inside one jit (chained by perturbing origin)
    @jax.jit
    def winner4(rays_b, alive):
        t_acc = jnp.zeros((N,), jnp.float32)
        o = rays_b.origin
        for it in range(4):
            rb = Rays(origin=o + 0.0 * t_acc[:, None],
                      direction=rays_b.direction, time=rays_b.time)
            t, code = intersect_packed_bvh(rb, packed, cfg.tmin, True,
                                           False, alive=alive)
            t_acc = t_acc + jnp.where(code >= 0, t, 0.0) * 1e-9
        return t_acc

    dt = timeit(lambda: winner4(rays, alive), reps=3)
    print(f"winner x4 (prim) : {dt*1e3:8.2f} ms total -> {dt/4*1e3:8.2f} ms/call")

    # shuffled wavefront (post-diffuse stand-in): permute rays randomly,
    # then sort them (what the real path sees after its coherence sort).
    perm = jax.random.permutation(jax.random.key(1), N)
    rays_sh = Rays(origin=rays.origin[perm], direction=rays.direction[perm],
                   time=rays.time[perm])
    # random directions: cosine-ish scatter
    dirs = jax.random.normal(jax.random.key(2), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    rays_sc = Rays(origin=rays_sh.origin, direction=dirs, time=rays_sh.time)

    @jax.jit
    def sort_rays(rays_b):
        key = ray_sort_key(
            rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
            rays_b.direction[:, 0], rays_b.direction[:, 1],
            rays_b.direction[:, 2], jnp.ones((N,), jnp.int32), lo, hi)
        out = jax.lax.sort(
            (key, rays_b.origin[:, 0], rays_b.origin[:, 1],
             rays_b.origin[:, 2], rays_b.direction[:, 0],
             rays_b.direction[:, 1], rays_b.direction[:, 2], rays_b.time),
            num_keys=1, is_stable=False)
        return Rays(origin=jnp.stack(out[1:4], -1),
                    direction=jnp.stack(out[4:7], -1), time=out[7])

    rays_sc = sort_rays(rays_sc)
    sync(rays_sc)
    dt = timeit(lambda: winner4(rays_sc, alive), reps=3)
    print(f"winner x4 (scat) : {dt*1e3:8.2f} ms total -> {dt/4*1e3:8.2f} ms/call")


if __name__ == "__main__":
    main()
