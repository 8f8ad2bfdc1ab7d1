#!/usr/bin/env python
"""TPU smoke test: compile + run the production megastep ON HARDWARE.

Interpret-mode CPU tests do not enforce Mosaic memory-space rules — round 2
shipped a mesh-BVH kernel that passed every CPU test but failed to compile
on the chip ('Can only load scalars from SMEM'). This script is the guard:
it renders (a) the brute/analytic Cornell path and (b) a >1024-triangle
mesh through the tile-BVH megastep on the real TPU and asserts finite,
non-trivial output. Run it after ANY bounce_kernel/intersect_kernel change:

    python tools/tpu_smoke.py

Exits non-zero on failure. Total runtime ~1 min (mostly compiles; cached
compiles make repeats fast).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from raytracingthenextweekcuda_tpu.config import RenderConfig
    from raytracingthenextweekcuda_tpu.models import integrator, presets
    from raytracingthenextweekcuda_tpu.models.scene import finalize

    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon") and "TPU" not in str(dev):
        print(f"WARNING: not a TPU ({dev}) — smoke test is meaningless")

    failures = []

    def check(name, scene, camera, cfg):
        t0 = time.perf_counter()
        try:
            film = integrator.render(scene, camera, cfg)
            img = np.asarray(film.accum)
            dt = time.perf_counter() - t0
            assert np.isfinite(img).all(), "non-finite pixels"
            assert img.mean() > 1e-4, f"black image (mean {img.mean():.2e})"
            print(f"  OK {name}: mean {img.mean():.4f}, {dt*1000:.0f} ms "
                  f"(incl. compile)")
        except Exception as e:  # noqa: BLE001 — report every path
            failures.append((name, e))
            print(f"  FAIL {name}: {type(e).__name__}: {str(e)[:300]}")

    print(f"device: {dev}")

    # (a) analytic/brute megastep (the headline path)
    scene, camera = presets.cornell_box()
    check("cornell (brute megastep)", finalize(scene), camera,
          RenderConfig(width=64, height=64, spp=2, bounces=5, spp_per_pass=2))

    # (b) >1024-triangle mesh -> tile-BVH block-consensus traversal
    from raytracingthenextweekcuda_tpu.io.procedural import uv_sphere_mesh
    from raytracingthenextweekcuda_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    b.lambertian(0, (0.73, 0.73, 0.73))
    b.coat(1, (0.9, 0.3, 0.0))
    b.emission(2, (1.0, 1.0, 1.0), 3.0)
    b.plane((0, -1.05, 0), (0, 1, 0), (5, 0, 5), 2, 0)
    b.sphere((0, 4, 0), 2.0, 2)
    b.mesh(uv_sphere_mesh(0.9, (0, 0, 0), 32, 64), 1)  # 3968 tris > 1024
    from raytracingthenextweekcuda_tpu.models.camera import Camera

    mesh_scene = b.build()
    n_tris = int(mesh_scene.triangles.count)
    mesh_scene = finalize(mesh_scene)
    assert mesh_scene.packed.bvh_meta is not None, (
        f"tile-BVH not built ({n_tris} tris)"
    )
    cam = Camera.make(eye=(0, 0.4, 2.6), center=(0, 0, 0), fov=45.0,
                      aperture=0.0, focus_distance=2.6, time1=1.0)
    check(f"mesh tile-BVH megastep ({n_tris} tris)", mesh_scene, cam,
          RenderConfig(width=64, height=64, spp=2, bounces=5, spp_per_pass=2))

    if failures:
        print(f"SMOKE FAILED: {len(failures)} path(s) broken on hardware")
        return 1
    print("SMOKE OK: all production paths compile + run on TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
