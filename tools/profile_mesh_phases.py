"""Per-phase timing of the sorted tile-BVH mesh path on TPU.

Decomposes one render pass: sort_wavefront cost vs bounce_step cost at
each bounce depth (coherent primaries vs diffuse scattered wavefronts),
to aim the next optimization. Usage:

    PYTHONPATH=/root/repo python tools/profile_mesh_phases.py [n_lat n_lon]
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
from raytracingthenextweekcuda_tpu.models import presets
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops import rng
from raytracingthenextweekcuda_tpu.ops.pallas.bounce_kernel import (
    bounce_step,
    planar_state,
)
from raytracingthenextweekcuda_tpu.ops.rays import Rays
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import sort_wavefront


def sync(*xs):
    # block_until_ready only: an eager jnp.sum dispatch costs ~50 ms through
    # the axon relay and would swamp sub-100ms phases.
    for x in xs:
        jax.tree_util.tree_map(
            lambda l: jax.block_until_ready(l) if hasattr(l, "block_until_ready") else l, x
        )


def timeit(fn, reps=5):
    out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    n_lat = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_lon = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print("device:", jax.devices()[0])
    scene, camera = presets.mesh_showcase(n_lat=n_lat, n_lon=n_lon)
    print("triangles:", int(scene.triangles.count))
    scene = finalize(scene)
    packed = scene.packed
    print("bvh nodes:", packed.bvh_meta.shape[1],
          "leaf tiles:", int(np.asarray(packed.bvh_meta)[0].sum()),
          "padded tris:", packed.trih.shape[1])

    cfg = RenderConfig(width=256, height=256, spp=8, bounces=8,
                       spp_per_pass=4)
    S = 4  # samples per wavefront (matches spp_per_pass grouping)
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
    print(f"wavefront: {N} rays ({N // 1024} blocks)")

    state = planar_state(rays)
    slot = jnp.arange(N, dtype=jnp.int32)
    lo = packed.bvh_bounds[0:3, 0]
    hi = packed.bvh_bounds[3:6, 0]

    @jax.jit
    def do_sort(state, pid, slot, b0, b1):
        return sort_wavefront(state, pid, slot, lo, hi, extras=(b0, b1))

    def make_step(bounce):
        u4 = rng.bounce_uniforms(
            rng.RayCtx(pid.astype(jnp.uint32), b0.astype(jnp.uint32),
                       b1.astype(jnp.uint32)),
            jnp.uint32(bounce),
        )

        def f(st):
            return bounce_step(scene, packed, st, u4, 0, cfg)

        return jax.jit(f)

    # Walk real bounces, timing each phase.
    for bounce in range(4):
        alive = int(np.asarray(jnp.sum(state[7] > 0)))
        if bounce > 0:
            dt_sort, out = timeit(
                lambda: do_sort(state, pid, slot, b0, b1))
            state, pid, slot, (b0, b1) = out
            print(f"bounce {bounce}: sort {dt_sort*1000:7.2f} ms", end="  ")
        else:
            print(f"bounce {bounce}: sort    --      ", end="  ")
        step = make_step(bounce)
        dt_step, new_state = timeit(lambda: step(state))
        print(f"megastep {dt_step*1000:7.2f} ms  alive {alive}/{N}")
        state = new_state

    # Whole-pass reference number.
    from raytracingthenextweekcuda_tpu.models import integrator

    key = jax.random.key(cfg.seed)
    sync(integrator.render(scene, camera, cfg, key=key).accum)
    t0 = time.perf_counter()
    sync(integrator.render(scene, camera, cfg, key=key).accum)
    dt = time.perf_counter() - t0
    paths = cfg.width * cfg.height * cfg.spp
    print(f"full render: {dt*1000:.1f} ms = {paths/dt/1e6:.3f} Mpaths/s")


if __name__ == "__main__":
    main()
