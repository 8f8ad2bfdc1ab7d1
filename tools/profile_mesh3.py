"""Round-3 profiling: where does the mesh-BVH render spend its 25 s?

Times, on the real chip, for the materialball+cornellbox2 scene:
  - build_worklist alone (XLA leaf slab pass)
  - winner kernel alone (primary rays, and shuffled rays to mimic bounce
    incoherence)
  - one full bounce via the integrator body
  - distribution of per-block leaf counts (work-list occupancy)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingthenextweekcuda_tpu.apps.bench import _REF_RES
from raytracingthenextweekcuda_tpu.io.ply import load_ply
from raytracingthenextweekcuda_tpu.io.yaml_scene import load_scene_builder
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.models import integrator
from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.ops import rays as rays_mod
from raytracingthenextweekcuda_tpu.ops.pallas import bvh_winner_kernel as wk


def sync(x):
    if isinstance(x, tuple):
        for e in x:
            sync(e)
        return
    np.asarray(jnp.sum(x))


def t_ms(fn, *a, n=5):
    fn(*a)
    sync(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / n * 1000


builder, camera = load_scene_builder(f"{_REF_RES}/scenes/cornellbox2.yaml")
tris_arr = load_ply(f"{_REF_RES}/models/materialball/materialball.ply",
                    offset=(0.1, 0.0, -1.0))
builder.coat(20, (0.9, 0.9, 0.9))
builder.mesh(tris_arr, 20)
scene = builder.build()
scene = finalize(scene)
packed = scene.packed
L = packed.leaf_bounds.shape[1]
tile = packed.trih.shape[1] // L
print(f"tris={scene.triangles.count} leaves={L} tile={tile} "
      f"padded={packed.trih.shape[1]}")

W = H = 512
cfg = RenderConfig(width=W, height=H, spp=1, bounces=10, spp_per_pass=1)
key = jax.random.key(0)

# Primary rays
from raytracingthenextweekcuda_tpu.models.camera import generate_rays, derive
n = W * H
frame = derive(camera, W / H)
rays, _ctx = generate_rays(frame, key, W, H)

ox, oy, oz = (rays.origin[:, i] for i in range(3))
dx, dy, dz = (rays.direction[:, i] for i in range(3))
alive = jnp.ones((n,), jnp.int32)

ms_wl = t_ms(lambda: wk.build_worklist(ox, oy, oz, dx, dy, dz, alive,
                                       packed.leaf_bounds, tmin=1e-3))
counts, order, entry = wk.build_worklist(ox, oy, oz, dx, dy, dz, alive,
                                  packed.leaf_bounds, tmin=1e-3)
cnp = np.asarray(counts).ravel()
print(f"build_worklist: {ms_wl:.2f} ms  leafcounts primary: "
      f"mean={cnp.mean():.1f} p50={np.percentile(cnp,50):.0f} "
      f"max={cnp.max()} of L={L}")

ms_win = t_ms(lambda: wk.intersect_packed_bvh(rays, packed))
print(f"winner (primary, incl worklist): {ms_win:.2f} ms")

# Shuffled rays = bounce-like incoherence (same rays, random block mix)
perm = np.random.default_rng(0).permutation(n)
rays_sh = rays_mod.Rays(origin=rays.origin[perm],
                        direction=rays.direction[perm],
                        time=rays.time[perm])
ms_win_sh = t_ms(lambda: wk.intersect_packed_bvh(rays_sh, packed))
counts2, _, _ = wk.build_worklist(*(rays_sh.origin[:, i] for i in range(3)),
                               *(rays_sh.direction[:, i] for i in range(3)),
                               alive, packed.leaf_bounds, tmin=1e-3)
c2 = np.asarray(counts2).ravel()
print(f"winner (shuffled): {ms_win_sh:.2f} ms  leafcounts: mean={c2.mean():.1f} "
      f"max={c2.max()}")

# Full render 1 spp
cfg1 = RenderConfig(width=W, height=H, spp=1, bounces=10, spp_per_pass=1)
ms_r1 = t_ms(lambda: integrator.render(scene, camera, cfg1, key=key).accum, n=3)
print(f"render 1spp 10 bounces: {ms_r1:.2f} ms")

# Block-size sweep for the winner kernel
import os
for blk in (1024, 512, 256, 128):
    os.environ["RTNW_WINNER_BLOCK"] = str(blk)
    ms_p = t_ms(lambda: wk.intersect_packed_bvh(rays, packed))
    ms_s = t_ms(lambda: wk.intersect_packed_bvh(rays_sh, packed))
    c, _, _ = wk.build_worklist(ox, oy, oz, dx, dy, dz, alive,
                             packed.leaf_bounds, tmin=1e-3, block=blk)
    print(f"block={blk:4d}: primary {ms_p:7.2f} ms  shuffled {ms_s:7.2f} ms  "
          f"leaves/block primary mean={np.asarray(c).ravel().mean():.1f}")
