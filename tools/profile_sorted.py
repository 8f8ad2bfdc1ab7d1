"""Measure the sorted-wavefront mesh path vs the unsorted megastep on TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_sorted.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize


def sync(x):
    np.asarray(jnp.sum(x))


def run(scene, camera, cfg, label, reps=4):
    key = jax.random.key(cfg.seed)
    t0 = time.perf_counter()
    sync(integrator.render(scene, camera, cfg, key=key).accum)  # warm
    warm = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(integrator.render(scene, camera, cfg, key=key).accum)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    paths = cfg.width * cfg.height * cfg.spp
    print(f"{label}: {dt*1000:.1f} ms  {paths/dt/1e6:.3f} Mpaths/s  "
          f"(warm {warm:.1f} s, reps {['%.0f' % (t*1000) for t in times]})")
    return paths / dt


def main():
    print("device:", jax.devices()[0])
    scene, camera = presets.mesh_showcase(n_lat=64, n_lon=128)
    print("triangles:", int(scene.triangles.count))
    scene = finalize(scene)
    assert scene.packed.bvh_bounds is not None

    base = dict(width=256, height=256, spp=8, bounces=8, spp_per_pass=4)
    s = run(scene, camera, RenderConfig(**base, sort_rays=True), "sorted  ")
    u = run(scene, camera, RenderConfig(**base, sort_rays=False), "unsorted")
    print(f"speedup: {s/u:.1f}x")


if __name__ == "__main__":
    main()
