#!/usr/bin/env python
"""Ablation profile of the whole-render kernel (bounce_kernel._run_render).

Times the ONE-dispatch render at the bench config under ablations to find
where kernel time goes: primitive loops (spheres/planes/triangles), BSDF
branch set, bounce count. Run on the real TPU.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import camera as camera_mod
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops.pallas.bounce_kernel import render_samples

W = H = 512
SPP = 16
REPS = 4


def sync(x):
    np.asarray(jnp.sum(x))


def timeit(fn):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / REPS * 1000.0 / SPP


def repack(packed, counts=None, used_kinds=None):
    from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import PackedScene
    return PackedScene(
        packed.spheres, packed.planes, packed.triangles,
        counts if counts is not None else packed.counts,
        used_kinds if used_kinds is not None else packed.used_kinds,
        shaded=packed.shaded, bvh_bounds=packed.bvh_bounds,
        bvh_meta=packed.bvh_meta,
    )


def run(scene, camera, cfg, used_kinds=None, label=""):
    frame = camera_mod.derive(camera, cfg.aspect_ratio)
    keys = jax.random.split(jax.random.key(0), SPP)
    packed = scene.packed
    if used_kinds is not None:
        packed = repack(packed, used_kinds=used_kinds)

    def fn():
        return render_samples(scene, packed, frame, keys, cfg)

    ms = timeit(fn)
    print(f"{label:44s} {ms:7.3f} ms/spp")
    return ms


def main():
    scene, camera = presets.cornell_box()
    scene = finalize(scene)
    S, P, T = scene.packed.counts
    print(f"counts: spheres={S} planes={P} triangles={T} "
          f"kinds={sorted(scene.packed.used_kinds)}")
    cfg = RenderConfig(width=W, height=H, spp=SPP, bounces=10)

    full = run(scene, camera, cfg, label="full (10 bounces)")

    # Bounce scaling.
    for b in (1, 2, 5):
        run(scene, camera, RenderConfig(width=W, height=H, spp=SPP, bounces=b),
            label=f"bounces={b}")

    # No triangles (drop the cubes): counts->(S, P, 0).
    no_tri = scene._replace(packed=repack(scene.packed, counts=(S, P, 0)))
    run(no_tri, camera, cfg, label="no triangles")

    # No planes.
    no_pla = scene._replace(packed=repack(scene.packed, counts=(S, 0, T)))
    run(no_pla, camera, cfg, label="no planes")

    # No spheres.
    no_sph = scene._replace(packed=repack(scene.packed, counts=(0, P, T)))
    run(no_sph, camera, cfg, label="no spheres")

    # BSDF pruned to lambertian only (image wrong; timing only).
    run(scene, camera, cfg, used_kinds=frozenset({0}),
        label="BSDF lambertian-only")

    # Lambertian-only AND no triangles: the floor.
    run(no_tri, camera, cfg, used_kinds=frozenset({0}),
        label="lambertian-only + no triangles")

    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
