"""Headline benchmark: Cornell box 512x512 (BASELINE.json metric).

The reference's best published number is 3857.460 ms for 512x512 x 32 spp at
<=10 bounces on an sm_61 GPU (images/images.MD:44-53), i.e. ~2.17 M camera
paths/s. We report paths/s on the same scene geometry (Cornell walls + light
+ metal/glass spheres + two cube meshes) and `vs_baseline` as the ratio to
that 2.17 M paths/s.
"""

from __future__ import annotations

import os
import time

REFERENCE_PATHS_PER_SEC = 512 * 512 * 32 / 3.857460  # images/images.MD:44-53


def run_bench(
    width: int = 512,
    height: int = 512,
    spp: int = 128,
    bounces: int = 10,
    # One pass = one device dispatch. Multiple passes serialize host->device
    # round trips (through the axon relay each costs ~200 ms, measured 3238
    # vs 1403 ms for 8 vs 1 dispatch); HBM holds one sample wavefront at a
    # time regardless because render_pass scans over samples.
    spp_per_pass: int = 128,
    use_bvh: bool = True,
    warmup: bool = True,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracingthenextweekcuda_tpu.config import RenderConfig
    from raytracingthenextweekcuda_tpu.models import integrator, presets
    from raytracingthenextweekcuda_tpu.models.scene import finalize

    scene, camera = presets.cornell_box()
    # finalize() packs the scene for the fused Pallas intersect kernel and
    # auto-selects brute-vs-BVH for meshes (the Cornell cubes stay brute).
    scene = finalize(scene)

    cfg = RenderConfig(
        width=width, height=height, spp=spp, bounces=bounces,
        spp_per_pass=spp_per_pass,
    )

    def sync(x):
        # block_until_ready can return before remote execution finishes on
        # relayed backends; a scalar readback is a true sync.
        np.asarray(jnp.sum(x))

    key = jax.random.key(cfg.seed)
    if warmup:  # compile outside the timed region (GPUTimer analogue)
        # Warm the FULL render() path (render_pass + film accumulation ops),
        # not just render_pass: film.add compiles lazily on first use and
        # costs ~1.3 s through the relay.
        warm_cfg = RenderConfig(
            width=width, height=height, spp=min(spp_per_pass, spp),
            bounces=bounces, spp_per_pass=spp_per_pass,
        )
        sync(integrator.render(scene, camera, warm_cfg, key=key).accum)

    t0 = time.perf_counter()
    film = integrator.render(scene, camera, cfg, key=key)
    sync(film.accum)
    dt = time.perf_counter() - t0

    paths = width * height * spp
    paths_per_sec = paths / dt
    result = {
        "metric": "paths/s/chip, Cornell box 512x512",
        "value": round(paths_per_sec, 1),
        "unit": "paths/s",
        "vs_baseline": round(paths_per_sec / REFERENCE_PATHS_PER_SEC, 3),
        "render_ms": round(dt * 1000, 2),
        "vpu_util": _vpu_utilization(scene, paths, bounces, dt),
        "config": {
            "width": width, "height": height, "spp": spp, "bounces": bounces,
            "device": str(jax.devices()[0]),
        },
    }
    try:
        result["mesh_bvh"] = run_mesh_bench()
    except Exception as e:  # secondary metric must never sink the headline
        result["mesh_bvh"] = {"error": str(e)[:200]}
    return result


def _vpu_utilization(scene, paths: int, bounces: int, dt: float):
    """Estimated VPU utilization (a path tracer's MFU analogue).

    A ray tracer has no matmuls, so the meaningful roofline is the VPU's
    f32 vector throughput, taken here as 3.9 Top/s for a v5e core
    (1024 lanes x ~0.94 GHz x 4 ALUs; FMA-heavy code can double that, so
    this is the conservative basis). Useful ops are modeled from the
    megastep's per-bounce workload: every live ray tests every packed
    primitive column (~35 ops/sphere, ~30/plane, ~43/Havel tri or quad)
    plus ~90 ops of BSDF/bookkeeping; raygen ~40. Dead-ray elision is
    ignored, so this slightly OVERcounts work — read it as an upper bound
    on useful-op throughput, not a hardware counter.
    """
    p = scene.packed
    if p is None:
        return None
    s_count, p_count, _ = p.counts
    trih, quads = getattr(p, "hcounts", (0, 0))
    per_bounce = (
        35 * s_count + 30 * p_count + 43 * (trih + quads) + 90
    )
    flops = paths * (40 + bounces * per_bounce)
    return round(flops / dt / 3.9e12, 4)


_REF_RES = "/root/reference/RayTracingTheNextWeekCUDA/resources"


def run_mesh_bench(
    width: int = 512, height: int = 512, spp: int = 32, bounces: int = 10,
    spp_per_pass: int = 16, sort_stride: int = 1,
) -> dict:
    """Secondary metric: BASELINE config 4 on the reference's OWN assets.

    The exact scene the reference's published numbers time: cornellbox2.yaml
    (5 walls + area light + metal/glass spheres + two rotated cube meshes,
    main.cu:629) PLUS materialball.ply — 46,816 triangles, COAT, normalized
    and offset (0.1, 0, -1) exactly as prepareCUDAscene does
    (main.cu:428-432) — at the published config: 512x512, 32 spp,
    <=10 bounces = 3857.460 ms on the reference GPU (images/images.MD:44-53,
    ~2.17 M paths/s). Rendered through the tile-BVH work-list winner path.

    Falls back to a 16k-tri procedural stand-in when /root/reference is not
    mounted (CI), and says so in the "asset" field.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracingthenextweekcuda_tpu.config import RenderConfig
    from raytracingthenextweekcuda_tpu.models import integrator, presets
    from raytracingthenextweekcuda_tpu.models.scene import finalize

    scene_yaml = f"{_REF_RES}/scenes/cornellbox2.yaml"
    ball_ply = f"{_REF_RES}/models/materialball/materialball.ply"
    if os.path.exists(scene_yaml) and os.path.exists(ball_ply):
        from raytracingthenextweekcuda_tpu.io.ply import load_ply
        from raytracingthenextweekcuda_tpu.io.yaml_scene import (
            load_scene_builder,
        )

        builder, camera = load_scene_builder(scene_yaml)
        tris_arr = load_ply(ball_ply, offset=(0.1, 0.0, -1.0))
        # COAT: Path B's clear-coat diffuse (CUDAPathTracer.cu:522-563);
        # specular layer is hard-coded white there, diffuse color rides the
        # triangle — materialball ships uncolored, so 0.9 grey.
        builder.coat(20, (0.9, 0.9, 0.9))
        builder.mesh(tris_arr, 20)
        scene = builder.build()
        asset = "cornellbox2.yaml + materialball.ply"
    else:
        scene, camera = presets.mesh_showcase(n_lat=64, n_lon=128)
        asset = "procedural uv-sphere stand-in (reference not mounted)"
    tris = int(scene.triangles.count)
    scene = finalize(scene)  # > threshold -> tile-BVH winner-kernel path

    cfg = RenderConfig(width=width, height=height, spp=spp, bounces=bounces,
                       spp_per_pass=spp_per_pass, sort_stride=sort_stride)

    def sync(x):
        np.asarray(jnp.sum(x))

    key = jax.random.key(cfg.seed)
    sync(integrator.render(scene, camera, cfg, key=key).accum)  # warm
    t0 = time.perf_counter()
    film = integrator.render(scene, camera, cfg, key=key)
    sync(film.accum)
    dt = time.perf_counter() - t0
    paths_per_sec = width * height * spp / dt
    return {
        "paths_per_sec": round(paths_per_sec, 1),
        "vs_baseline": round(paths_per_sec / REFERENCE_PATHS_PER_SEC, 3),
        "render_ms": round(dt * 1000, 2),
        "triangles": tris,
        "asset": asset,
        "config": {"width": width, "height": height, "spp": spp,
                   "bounces": bounces},
    }
