"""Per-bounce phase breakdown of the mesh_stress bench on TPU.

Reproduces the exact BENCH mesh_stress workload (cornellbox2 +
materialball, 512x512, 16-sample sorted wavefront) and times, at each
bounce depth: the coherence sort, the analytic winner kernel, the
work-list build, the mesh winner kernel, and the full bounce body —
plus per-block walked/evaluated-leaf stats from the kernel's counters.

Usage: PYTHONPATH=/root/repo python tools/profile_stress.py [bounces]
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

from raytracingthenextweekcuda_tpu.apps.bench_scenes import stress_mesh_scene
from raytracingthenextweekcuda_tpu.config import INFINITY, RenderConfig
from raytracingthenextweekcuda_tpu.models import camera as camera_mod
from raytracingthenextweekcuda_tpu.models.integrator import _bounce_body
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops import rng
from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
    build_worklist,
    intersect_packed_bvh,
    use_frustum_worklist,
)
from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
    BIG,
    intersect_packed,
)
from raytracingthenextweekcuda_tpu.ops.rays import Rays
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import (
    DEAD_KEY,
    ray_sort_key,
)


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
    bounces = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print("device:", jax.devices()[0], flush=True)
    scene, camera, asset = stress_mesh_scene()
    print("asset:", asset, "tris:", int(scene.triangles.count))
    scene = finalize(scene)
    packed = scene.packed
    L = packed.leaf_bounds.shape[1]
    tile = packed.trih.shape[1] // L
    print(f"leaves {L}  tile {tile}  padded tris {packed.trih.shape[1]}")

    cfg = RenderConfig(width=512, height=512, spp=16, bounces=bounces,
                       spp_per_pass=16)
    S = 16
    frame = camera_mod.derive(camera, cfg.aspect_ratio)
    keys = jax.random.split(jax.random.key(cfg.seed), S)
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
    block = int(os.environ.get("RTNW_WINNER_BLOCK", "128"))
    print(f"wavefront: {N} rays ({N // block} blocks of {block})")

    lo = packed.bvh_bounds[0:3, 0]
    hi = packed.bvh_bounds[3:6, 0]
    dtype = rays.origin.dtype
    state = (rays, jnp.ones((N, 3), dtype), jnp.zeros((N, 3), dtype),
             jnp.ones((N,), bool))

    @jax.jit
    def do_sort(state, pid, slot, b0, b1):
        rays_b, tp, rad, alive = state
        key = ray_sort_key(
            rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
            rays_b.direction[:, 0], rays_b.direction[:, 1],
            rays_b.direction[:, 2], alive.astype(jnp.int32), lo, hi)
        rows = (rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
                rays_b.direction[:, 0], rays_b.direction[:, 1],
                rays_b.direction[:, 2],
                tp[:, 0], tp[:, 1], tp[:, 2], rad[:, 0], rad[:, 1],
                rad[:, 2], rays_b.time)
        out = jax.lax.sort((key, *rows, pid, slot, b0, b1), num_keys=1,
                           is_stable=False)
        st = (Rays(origin=jnp.stack(out[1:4], -1),
                   direction=jnp.stack(out[4:7], -1), time=out[13]),
              jnp.stack(out[7:10], -1), jnp.stack(out[10:13], -1),
              out[0] != DEAD_KEY)
        return st, out[14], out[15], out[16], out[17]

    @jax.jit
    def analytic(rays_b, alive):
        return intersect_packed(rays_b, packed, cfg.tmin, True, False,
                                alive=alive, include_triangles=False)

    def mesh_inputs(rays_b, alive, t_sel, code):
        o = rays_b.origin
        d = rays_b.direction
        lbs = packed.leaf_bounds
        root_lo = jnp.min(lbs[0:3], axis=1)
        root_hi = jnp.max(lbs[3:6], axis=1)
        eps = 1e-20
        d_safe = jnp.where(jnp.abs(d) < eps,
                           jnp.where(d >= 0.0, eps, -eps), d)
        inv = 1.0 / d_safe
        t0 = (root_lo[None, :] - o) * inv
        t1 = (root_hi[None, :] - o) * inv
        rtn = jnp.max(jnp.minimum(t0, t1), axis=1)
        rtf = jnp.min(jnp.maximum(t0, t1), axis=1)
        root_hit = (rtf >= rtn) & (rtf >= cfg.tmin)
        unoccluded = (code < 0) | (rtn <= t_sel)
        alive_mesh = root_hit & unoccluded & alive
        t_cap = jnp.where(code >= 0, t_sel, BIG)
        return alive_mesh, t_cap

    @jax.jit
    def wl_build(rays_b, alive_mesh):
        npad = ((N + block - 1) // block) * block

        def pad(a):
            return jnp.pad(a, (0, npad - N)) if npad != N else a

        comps = tuple(pad(c) for c in (
            rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
            rays_b.direction[:, 0], rays_b.direction[:, 1],
            rays_b.direction[:, 2]))
        return build_worklist(
            *comps, pad(alive_mesh.astype(jnp.int32)), packed.leaf_bounds,
            tmin=float(cfg.tmin), block=block,
            frustum=use_frustum_worklist(L))

    @jax.jit
    def winner(rays_b, alive_mesh, t_cap):
        return intersect_packed_bvh(rays_b, packed, cfg.tmin, True, False,
                                    alive=alive_mesh, t_cap=t_cap)

    def winner_stats(rays_b, alive_mesh, t_cap):
        return intersect_packed_bvh(rays_b, packed, cfg.tmin, True, False,
                                    alive=alive_mesh, t_cap=t_cap, stats=True)

    slot = jnp.arange(N, dtype=jnp.int32)

    def make_bounce(bounce):
        def f(state, pid, b0, b1):
            ctx_b = rng.RayCtx(pid.astype(jnp.uint32), b0.astype(jnp.uint32),
                               b1.astype(jnp.uint32))
            return _bounce_body(scene, cfg, state, ctx_b, jnp.uint32(bounce))
        return jax.jit(f)

    tot = {"sort": 0.0, "analytic": 0.0, "wl": 0.0, "winner": 0.0,
           "bounce": 0.0}
    for bounce in range(bounces):
        alive_ct = int(np.asarray(jnp.sum(state[3])))
        if bounce > 0:
            dt_sort, out = timeit(lambda: do_sort(state, pid, slot, b0, b1))
            state, pid, slot, b0, b1 = out
            tot["sort"] += dt_sort
        else:
            dt_sort = 0.0
        rays_b, alive = state[0], state[3]
        dt_an, (t_sel, code) = timeit(lambda: analytic(rays_b, alive))
        alive_mesh, t_cap = jax.jit(mesh_inputs)(rays_b, alive, t_sel, code)
        sync((alive_mesh, t_cap))
        dt_wl, _ = timeit(lambda: wl_build(rays_b, alive_mesh))
        dt_win, _ = timeit(lambda: winner(rays_b, alive_mesh, t_cap))
        _, _, (counts, st) = winner_stats(rays_b, alive_mesh, t_cap)
        counts = np.asarray(counts)
        st = np.asarray(st)  # (B, 2) walked, evaluated
        nz = counts > 0
        step = make_bounce(bounce)
        dt_b, new_state = timeit(lambda: step(state, pid, b0, b1))
        am = int(np.asarray(jnp.sum(alive_mesh)))
        print(f"b{bounce}: sort {dt_sort*1e3:6.1f}  analytic {dt_an*1e3:6.1f} "
              f" wl {dt_wl*1e3:6.1f}  winner {dt_win*1e3:6.1f} "
              f" bounce_total {dt_b*1e3:7.1f} ms | alive {alive_ct*100//N}% "
              f"mesh {am*100//N}% | listed mean {counts[nz].mean() if nz.any() else 0:5.1f} "
              f"walked {st[nz.ravel(), 0].mean() if nz.any() else 0:5.1f} "
              f"eval {st[nz.ravel(), 1].mean() if nz.any() else 0:5.1f}",
              flush=True)
        tot["analytic"] += dt_an
        tot["wl"] += dt_wl
        tot["winner"] += dt_win
        tot["bounce"] += dt_b
        state = new_state
    print("totals (1 pass of 2):", {k: round(v * 1e3, 1) for k, v in tot.items()})


if __name__ == "__main__":
    main()
