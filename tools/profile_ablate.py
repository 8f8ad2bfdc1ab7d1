"""Ablation timing of the mesh bounce via in-jit repetition.

Per-dispatch timings through the axon relay are flaky (20-50 ms artifacts),
so each phase is measured as the MARGINAL cost of extra in-jit repetitions:
time(K2 reps) - time(K1 reps) over (K2-K1), all inside one lax.scan — the
dispatch overhead cancels exactly.

Usage: PYTHONPATH=/root/repo python tools/profile_ablate.py
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

from raytracingthenextweekcuda_tpu.config import INFINITY, RenderConfig
from raytracingthenextweekcuda_tpu.models import camera as camera_mod
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops import rng
from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
    _winner_nodiff,
    build_worklist,
)
from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
    intersect_packed,
)
from raytracingthenextweekcuda_tpu.ops.rays import Rays
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import ray_sort_key


def marginal(make_scan, k1=3, k2=11, reps=3):
    f1, f2 = make_scan(k1), make_scan(k2)

    def run(f):
        r = f()
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = run(f1), run(f2)
    return (t2 - t1) / (k2 - k1) * 1000


def main():
    print("device:", jax.devices()[0])
    scene, camera = presets.mesh_showcase(n_lat=64, n_lon=128)
    scene = finalize(scene)
    packed = scene.packed
    cfg = RenderConfig(width=256, height=256, spp=8, bounces=8,
                       spp_per_pass=4)
    S = 4
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
    ctx = rng.RayCtx(pid.astype(jnp.uint32), b0.astype(jnp.uint32),
                     b1.astype(jnp.uint32))

    # Advance to a post-diffuse wavefront, sorted (the realistic regime).
    state = (rays, jnp.ones((N, 3)), jnp.zeros((N, 3)), jnp.ones((N,), bool))
    for b in range(2):
        state = integrator._bounce_body(scene, cfg, state, ctx, jnp.uint32(b))
    rays_b, tp, rad, alive = state
    lo = packed.bvh_bounds[0:3, 0]
    hi = packed.bvh_bounds[3:6, 0]
    key = ray_sort_key(
        rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
        rays_b.direction[:, 0], rays_b.direction[:, 1],
        rays_b.direction[:, 2], alive.astype(jnp.int32), lo, hi,
    )
    _, perm = jax.lax.sort((key, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    g = lambda a: jnp.take(a, perm, axis=0)
    rays_b = Rays(g(rays_b.origin), g(rays_b.direction), g(rays_b.time))
    alive = g(alive)
    state = (rays_b, g(tp), g(rad), alive)
    ctx = rng.RayCtx(g(pid).astype(jnp.uint32), g(b0).astype(jnp.uint32),
                     g(b1).astype(jnp.uint32))
    alive_n = int(np.asarray(alive.sum()))
    print(f"wavefront: {N} rays, {alive_n} alive (sorted, bounce-2 state)")
    jax.block_until_ready(state)

    o, d = rays_b.origin, rays_b.direction
    comps6 = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
    alive_i = alive.astype(jnp.int32)
    trih_geom = packed.trih[:12]
    counts, order = build_worklist(
        *comps6, alive_i, packed.leaf_bounds, tmin=float(cfg.tmin))
    jax.block_until_ready((counts, order))

    def scan_of(step):
        def make(k):
            @jax.jit
            def f():
                def body(c, _):
                    return step(c), None
                out, _ = jax.lax.scan(body, 0.0, None, length=k)
                return out
            return f
        return make

    # 1. full bounce (state carried honestly through the chain)
    def make_full(k):
        @jax.jit
        def f():
            def body(c, i):
                return integrator._bounce_body(
                    scene, cfg, c, ctx, jnp.uint32(2)), None
            out, _ = jax.lax.scan(body, state, jnp.arange(k))
            return out[2]
        return f

    print(f"full bounce      {marginal(make_full):8.2f} ms")

    # 2. intersect_scene only (winner + analytic + recompute/merge)
    def step_isect(c):
        hit = integrator.intersect_scene(
            scene, rays_b, cfg.tmin, INFINITY, alive=alive)
        return c + jnp.sum(hit.t * 1e-9) + jnp.sum(hit.normal[:, 0]) * 1e-9

    print(f"intersect_scene  {marginal(scan_of(step_isect)):8.2f} ms")

    # 3. winner kernel only
    def step_winner(c):
        t, code = _winner_nodiff(
            ((*comps6, alive_i), counts, order, packed.leaf_bounds,
             packed.leaf_tiles, trih_geom),
            float(cfg.tmin), True, False)
        return c + jnp.sum(t * 1e-9) + jnp.sum(code) * 1e-9

    print(f"winner kernel    {marginal(scan_of(step_winner)):8.2f} ms")

    # 4. worklist build only
    def step_wl(c):
        cnt, orr = build_worklist(
            *comps6, alive_i, packed.leaf_bounds, tmin=float(cfg.tmin))
        return c + jnp.sum(cnt) * 1e-9 + jnp.sum(orr[:, 0, 0]) * 1e-9

    print(f"build_worklist   {marginal(scan_of(step_wl)):8.2f} ms")

    # 5. analytic kernel only
    def step_analytic(c):
        t, code = intersect_packed(rays_b, packed, cfg.tmin, True, False,
                                   alive=alive, include_triangles=False)
        return c + jnp.sum(t * 1e-9) + jnp.sum(code) * 1e-9

    print(f"analytic kernel  {marginal(scan_of(step_analytic)):8.2f} ms")

    cnts = np.asarray(counts)[:, 0, 0]
    print(f"tiles/blk mean {cnts.mean():.1f} max {cnts.max()} "
          f"sum {cnts.sum()}")


if __name__ == "__main__":
    main()


def shading_breakdown():
    """Phase 2: decompose the non-intersect ~40 ms of the bounce."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracingthenextweekcuda_tpu.config import INFINITY, RenderConfig
    from raytracingthenextweekcuda_tpu.models import camera as camera_mod
    from raytracingthenextweekcuda_tpu.models import integrator, presets
    from raytracingthenextweekcuda_tpu.models.scene import finalize
    from raytracingthenextweekcuda_tpu.ops import rng
    from raytracingthenextweekcuda_tpu.ops.materials import scatter
    from raytracingthenextweekcuda_tpu.ops.rays import Rays

    scene, camera = presets.mesh_showcase(n_lat=64, n_lon=128)
    scene = finalize(scene)
    cfg = RenderConfig(width=256, height=256, spp=8, bounces=8,
                       spp_per_pass=4)
    S = 4
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
    pid = jnp.concatenate([c.pixel_id for c in ctx_l]).astype(jnp.uint32)
    b0 = jnp.concatenate(
        [jnp.broadcast_to(c.base0, (n,)) for c in ctx_l]).astype(jnp.uint32)
    b1 = jnp.concatenate(
        [jnp.broadcast_to(c.base1, (n,)) for c in ctx_l]).astype(jnp.uint32)
    ctx = rng.RayCtx(pid, b0, b1)
    N = rays.count
    state = (rays, jnp.ones((N, 3)), jnp.zeros((N, 3)), jnp.ones((N,), bool))
    for b in range(2):
        state = integrator._bounce_body(scene, cfg, state, ctx, jnp.uint32(b))
    rays_b, tp, rad, alive = state
    hit = integrator.intersect_scene(scene, rays_b, cfg.tmin, INFINITY,
                                     alive=alive)
    hit = jax.tree_util.tree_map(jax.lax.stop_gradient, hit)
    jax.block_until_ready((state, hit))
    used_kinds = scene.packed.used_kinds

    def scan_of(step):
        def make(k):
            @jax.jit
            def f():
                def body(c, _):
                    return step(c), None
                out, _ = jax.lax.scan(body, 0.0, None, length=k)
                return out
            return f
        return make

    def step_u4(c):
        u4 = rng.bounce_uniforms(ctx, jnp.uint32(2))
        return c + jnp.sum(u4) * 1e-9

    def step_gather(c):
        mat = scene.materials.gather(hit.material_id)
        return c + jnp.sum(mat.albedo) * 1e-9 + jnp.sum(mat.emission) * 1e-9

    u4c = rng.bounce_uniforms(ctx, jnp.uint32(2))
    matc = scene.materials.gather(hit.material_id)
    jax.block_until_ready((u4c, matc))

    def step_scatter(c):
        scat = scatter(u4c, rays_b, hit, matc, used_kinds)
        return (c + jnp.sum(scat.direction) * 1e-9
                + jnp.sum(scat.attenuation) * 1e-9)

    print(f"bounce_uniforms  {marginal(scan_of(step_u4)):8.2f} ms")
    print(f"materials.gather {marginal(scan_of(step_gather)):8.2f} ms")
    print(f"scatter          {marginal(scan_of(step_scatter)):8.2f} ms")


if __name__ == "__main__" and os.environ.get("RTNW_SHADING"):
    shading_breakdown()
