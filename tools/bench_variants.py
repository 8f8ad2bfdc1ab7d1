"""Quick A/B of mesh-path variants: full-render time under env switches.

Usage: python tools/bench_variants.py   (run once per env combo; reads
RTNW_LEAF / RTNW_NO_PRUNE / RTNW_S from the environment)
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
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize


def main():
    spp_pp = int(os.environ.get("RTNW_S", "4"))
    scene, camera = presets.mesh_showcase(n_lat=64, n_lon=128)
    scene = finalize(scene)
    cfg = RenderConfig(width=256, height=256, spp=8, bounces=8,
                       spp_per_pass=spp_pp)
    key = jax.random.key(cfg.seed)
    t0 = time.perf_counter()
    jax.block_until_ready(integrator.render(scene, camera, cfg, key=key).accum)
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(
            integrator.render(scene, camera, cfg, key=key).accum)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    paths = cfg.width * cfg.height * cfg.spp
    print(f"LEAF={os.environ.get('RTNW_LEAF', '128')} "
          f"PRUNE={'no' if os.environ.get('RTNW_NO_PRUNE') else 'yes'} "
          f"S={spp_pp}: {dt*1000:.1f} ms = {paths/dt/1e6:.3f} Mpaths/s "
          f"(warm {warm:.0f}s)")


if __name__ == "__main__":
    main()
