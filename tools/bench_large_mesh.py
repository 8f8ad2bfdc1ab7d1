"""Large-mesh scaling check: work-list build on a 500k+ triangle scene.

Replicates the reference's materialball into a grid (12 copies ~ 562k
triangles -> ~4.4k 128-tri leaf tiles, above FRUSTUM_LEAF_THRESHOLD so
build_worklist auto-selects the O(blocks x leaves) packet-frustum pass)
and reports, for a primary wavefront and a shuffled one:

  - work-list build time (frustum) vs the exact O(rays x leaves) pass
  - listed leaves per block (mean / p95) for both builders
  - winner-kernel time through the production entry point

Usage: PYTHONPATH=/root/repo python tools/bench_large_mesh.py [copies]
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
from raytracingthenextweekcuda_tpu.models.camera import Camera
from raytracingthenextweekcuda_tpu.models.scene import SceneBuilder, finalize
from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
    build_worklist,
    intersect_packed_bvh,
)
from raytracingthenextweekcuda_tpu.io.ply import load_ply

_REF = "/root/reference/RayTracingTheNextWeekCUDA/resources"


def sync(x):
    jax.tree_util.tree_map(
        lambda l: jax.block_until_ready(l)
        if hasattr(l, "block_until_ready") else l, x)


def timeit(fn, reps=3):
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
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    print("device:", jax.devices()[0])
    ball = load_ply(f"{_REF}/models/materialball/materialball.ply")
    b = SceneBuilder()
    b.lambertian(0, (0.8, 0.8, 0.8))
    b.coat(1, (0.9, 0.9, 0.9))
    b.plane((0, -1.2, 0), (0, 1, 0), (40, 0, 40), 2, 0)
    side = int(np.ceil(np.sqrt(copies)))
    for i in range(copies):
        gx, gz = i % side, i // side
        off = np.asarray([(gx - side / 2) * 2.5, 0.0, -3.0 - gz * 2.5],
                         np.float32)
        b.mesh(ball + off, 1)
    scene = b.build()
    T = int(scene.triangles.count)
    t0 = time.perf_counter()
    scene = finalize(scene, use_bvh=True)
    t_build = time.perf_counter() - t0
    L = scene.packed.leaf_bounds.shape[1]
    print(f"triangles {T}  leaves {L}  SAH+pack build {t_build:.1f}s "
          f"(disk-cached after first run)")

    camera = Camera.make(eye=(0, 1.5, 4.0), center=(0, 0, -4.0), fov=55.0,
                         aperture=0.0, focus_distance=8.0, time1=1.0)
    cfg = RenderConfig(width=512, height=512, spp=1, bounces=4)
    frame = camera_mod.derive(camera, cfg.aspect_ratio)
    rays, _ = camera_mod.generate_rays(frame, jax.random.key(0), 512, 512)
    N = rays.count
    block = int(os.environ.get("RTNW_WINNER_BLOCK", "128"))
    alive = jnp.ones((N,), jnp.int32)
    comps = (rays.origin[:, 0], rays.origin[:, 1], rays.origin[:, 2],
             rays.direction[:, 0], rays.direction[:, 1],
             rays.direction[:, 2])

    def wavefronts():
        yield "primary ", rays
        perm = jax.random.permutation(jax.random.key(1), N)
        from raytracingthenextweekcuda_tpu.ops.rays import Rays
        from raytracingthenextweekcuda_tpu.ops.wavefront_sort import (
            DEAD_KEY, ray_sort_key,
        )

        dirs = jax.random.normal(jax.random.key(2), (N, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
        r2 = Rays(origin=rays.origin[perm], direction=dirs, time=rays.time)
        lo = scene.packed.bvh_bounds[0:3, 0]
        hi = scene.packed.bvh_bounds[3:6, 0]
        key = ray_sort_key(r2.origin[:, 0], r2.origin[:, 1], r2.origin[:, 2],
                           dirs[:, 0], dirs[:, 1], dirs[:, 2],
                           jnp.ones((N,), jnp.int32), lo, hi)
        out = jax.lax.sort((key, r2.origin[:, 0], r2.origin[:, 1],
                            r2.origin[:, 2], dirs[:, 0], dirs[:, 1],
                            dirs[:, 2], rays.time), num_keys=1)
        yield "scattered", Rays(origin=jnp.stack(out[1:4], -1),
                                direction=jnp.stack(out[4:7], -1),
                                time=out[7])

    for name, rb in wavefronts():
        c = (rb.origin[:, 0], rb.origin[:, 1], rb.origin[:, 2],
             rb.direction[:, 0], rb.direction[:, 1], rb.direction[:, 2])
        for label, frustum in (("frustum", True), ("exact  ", False)):
            f = jax.jit(lambda *a, fr=frustum: build_worklist(
                *a, alive, scene.packed.leaf_bounds, tmin=1e-3, block=block,
                frustum=fr))
            dt, (counts, order, entry) = timeit(lambda: f(*c))
            nz = np.asarray(counts).ravel()
            nz = nz[nz > 0]
            print(f"{name} {label}: build {dt*1e3:7.1f} ms  "
                  f"listed mean {nz.mean() if len(nz) else 0:6.1f} "
                  f"p95 {np.percentile(nz, 95) if len(nz) else 0:6.0f} "
                  f"nzblk {len(nz)}/{N // block}", flush=True)
        dt, _ = timeit(lambda: intersect_packed_bvh(
            rb, scene.packed, 1e-3, True, False, alive=alive != 0))
        print(f"{name} winner (production, auto-builder): {dt*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
