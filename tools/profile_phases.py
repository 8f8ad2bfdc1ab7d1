#!/usr/bin/env python
"""Decompose bench time: raygen vs per-bounce RNG vs fused bounce kernel.

Times each phase in isolation at the bench wavefront (512x512 rays) to find
where the 595 ms headline render actually goes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import camera as camera_mod
from raytracingthenextweekcuda_tpu.models import presets
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops.pallas.bounce_kernel import (
    bounce_step,
    planar_state,
)

W = H = 512
N = W * H
BOUNCES = 10
REPS = 16


def sync(x):
    np.asarray(jnp.sum(x))


def timeit(fn, *args):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / REPS * 1000.0


def main():
    scene, camera = presets.cornell_box()
    scene = finalize(scene)
    cfg = RenderConfig(width=W, height=H, spp=1, bounces=BOUNCES)
    frame = camera_mod.derive(camera, cfg.aspect_ratio)
    key = jax.random.key(0)

    # --- raygen (incl. per-pixel fold_in + uniform(5)) ---
    @jax.jit
    def raygen(k):
        rays, keys = camera_mod.generate_rays(frame, k, W, H)
        return rays.origin, keys

    t_raygen = timeit(raygen, key)

    # --- per-bounce RNG: pcg4d uniforms over the wavefront ---
    from raytracingthenextweekcuda_tpu.ops import rng as rng_mod

    _, ctx = jax.jit(
        lambda k: camera_mod.generate_rays(frame, k, W, H)
    )(key)

    @jax.jit
    def bounce_rng(ctx):
        def one(u, b):
            u4 = rng_mod.bounce_uniforms(ctx, b)
            return u + jnp.sum(u4), None

        out, _ = jax.lax.scan(one, 0.0, jnp.arange(BOUNCES))
        return out

    t_rng = timeit(bounce_rng, ctx)

    # --- fused bounce kernel alone (fixed u4, 10 bounces) ---
    rays, _ = jax.jit(lambda k: camera_mod.generate_rays(frame, k, W, H))(key)
    u4 = jax.random.uniform(jax.random.key(1), (N, 4))

    @jax.jit
    def kernel_only(rays_o, rays_d, rays_t, u4):
        from raytracingthenextweekcuda_tpu.ops.rays import Rays

        state = planar_state(Rays(rays_o, rays_d, rays_t))

        def one(st, b):
            do_rr = (b >= cfg.rr_start_bounce).astype(jnp.int32)
            return bounce_step(scene, scene.packed, st, u4, do_rr, cfg), None

        state, _ = jax.lax.scan(one, state, jnp.arange(BOUNCES))
        return state[11]

    t_kernel = timeit(kernel_only, rays.origin, rays.direction, rays.time, u4)

    # --- full single-sample trace (current production path) ---
    from raytracingthenextweekcuda_tpu.models import integrator

    @jax.jit
    def full(k):
        rays, keys = camera_mod.generate_rays(frame, k, W, H)
        return integrator.trace(scene, rays, keys, cfg)

    t_full = timeit(full, key)

    print(f"raygen (threefry keys + uniform5):  {t_raygen:8.3f} ms")
    print(f"bounce RNG x{BOUNCES} (fold_in+uniform4): {t_rng:8.3f} ms")
    print(f"fused kernel x{BOUNCES} (fixed u4):       {t_kernel:8.3f} ms")
    print(f"full trace (raygen+rng+kernel):     {t_full:8.3f} ms")
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
