"""Round-4 profiler: per-phase timing of the PRODUCTION mesh bench path.

Replays _trace_sorted's exact per-bounce composition on the real
cornellbox2 + materialball assets at the bench wavefront size
(512x512 x 16-spp group = 4.2M rays), timing each phase separately:

  sort        the 17-operand lax.sort coherence sort
  worklist    build_worklist (per-block leaf lists)
  winner      the Pallas winner kernel (_winner_nodiff)
  analytic    intersect_packed over spheres/planes
  bounce      the whole _bounce_body (winner+analytic+recompute+scatter)

Usage: PYTHONPATH=/root/repo python tools/profile_r4.py [spp_group]
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
from raytracingthenextweekcuda_tpu.models.integrator import _bounce_body
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops import rng
from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
    _winner_nodiff,
    build_worklist,
    intersect_packed_bvh,
)
from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
    RAY_BLOCK,
    intersect_packed,
)
from raytracingthenextweekcuda_tpu.ops.rays import Rays
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import DEAD_KEY, ray_sort_key

_REF_RES = "/root/reference/RayTracingTheNextWeekCUDA/resources"


def load_scene():
    from raytracingthenextweekcuda_tpu.io.ply import load_ply
    from raytracingthenextweekcuda_tpu.io.yaml_scene import load_scene_builder

    builder, camera = load_scene_builder(f"{_REF_RES}/scenes/cornellbox2.yaml")
    tris_arr = load_ply(
        f"{_REF_RES}/models/materialball/materialball.ply",
        offset=(0.1, 0.0, -1.0),
    )
    builder.coat(20, (0.9, 0.9, 0.9))
    builder.mesh(tris_arr, 20)
    return finalize(builder.build()), camera


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
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print("device:", jax.devices()[0])
    scene, camera = load_scene()
    packed = scene.packed
    L = packed.leaf_bounds.shape[1]
    tile = packed.trih.shape[1] // L
    print(f"tris={int(scene.triangles.count)} leaves={L} tile={tile} "
          f"padded={packed.trih.shape[1]}")

    cfg = RenderConfig(width=512, height=512, spp=32, bounces=10,
                       spp_per_pass=16)
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
    block = int(os.environ.get("RTNW_WINNER_BLOCK", "256"))
    print(f"wavefront: {N} rays, block={block} -> {N // block} blocks")

    dtype = rays.origin.dtype
    state = (rays, jnp.ones((N, 3), dtype), jnp.zeros((N, 3), dtype),
             jnp.ones((N,), bool))
    slot = jnp.arange(N, dtype=jnp.int32)
    lo = packed.bvh_bounds[0:3, 0]
    hi = packed.bvh_bounds[3:6, 0]

    @jax.jit
    def do_sort(state, pid, slot, b0, b1):
        rays_b, throughput, radiance, alive = state
        key = ray_sort_key(
            rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
            rays_b.direction[:, 0], rays_b.direction[:, 1],
            rays_b.direction[:, 2], alive.astype(jnp.int32), lo, hi)
        out = jax.lax.sort(
            (key,
             rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
             rays_b.direction[:, 0], rays_b.direction[:, 1],
             rays_b.direction[:, 2], rays_b.time,
             throughput[:, 0], throughput[:, 1], throughput[:, 2],
             radiance[:, 0], radiance[:, 1], radiance[:, 2],
             pid, slot, b0, b1),
            num_keys=1, is_stable=False)
        key_s = out[0]
        st = (Rays(origin=jnp.stack(out[1:4], axis=-1),
                   direction=jnp.stack(out[4:7], axis=-1), time=out[7]),
              jnp.stack(out[8:11], axis=-1), jnp.stack(out[11:14], axis=-1),
              key_s != DEAD_KEY)
        return st, out[14], out[15], out[16], out[17]

    @jax.jit
    def mesh_alive(rays_b, alive):
        sg = jax.lax.stop_gradient
        o, d = sg(rays_b.origin), sg(rays_b.direction)
        lbs = sg(packed.leaf_bounds)
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
        return (rtf >= rtn) & (rtf >= cfg.tmin) & alive

    @jax.jit
    def do_worklist(rays_b, alive_i):
        comps = (rays_b.origin[:, 0], rays_b.origin[:, 1],
                 rays_b.origin[:, 2], rays_b.direction[:, 0],
                 rays_b.direction[:, 1], rays_b.direction[:, 2])
        return build_worklist(*comps, alive_i, packed.leaf_bounds,
                              tmin=float(cfg.tmin), block=block)

    @jax.jit
    def do_winner(rays_b, alive):
        return intersect_packed_bvh(rays_b, packed, cfg.tmin, True, False,
                                    alive=alive)

    @jax.jit
    def do_winner_stats(rays_b, alive):
        return intersect_packed_bvh(rays_b, packed, cfg.tmin, True, False,
                                    alive=alive, stats=True)

    @jax.jit
    def do_analytic(rays_b, alive):
        return intersect_packed(rays_b, packed, cfg.tmin, True, False,
                                alive=alive, include_triangles=False)

    def make_bounce(bounce):
        def f(state, pid, b0, b1):
            ctx_b = rng.RayCtx(pid.astype(jnp.uint32), b0.astype(jnp.uint32),
                               b1.astype(jnp.uint32))
            return _bounce_body(scene, cfg, state, ctx_b, jnp.uint32(bounce))
        return jax.jit(f)

    total = dict(sort=0.0, worklist=0.0, winner=0.0, analytic=0.0, bounce=0.0)
    for bounce in range(cfg.bounces):
        alive_n = int(np.asarray(jnp.sum(state[3])))
        am = mesh_alive(state[0], state[3])
        am_n = int(np.asarray(jnp.sum(am)))
        line = f"b{bounce}: alive {alive_n:8d} mesh {am_n:8d}"
        if bounce > 0:
            dt, out = timeit(lambda: do_sort(state, pid, slot, b0, b1))
            state, pid, slot, b0, b1 = out
            total["sort"] += dt
            line += f"  sort {dt*1e3:7.1f}"
            am = mesh_alive(state[0], state[3])
        dt_wl, wl = timeit(
            lambda: do_worklist(state[0], am.astype(jnp.int32)))
        counts = np.asarray(wl[0]).ravel()
        total["worklist"] += dt_wl
        dt_w, _ = timeit(lambda: do_winner(state[0], am))
        total["winner"] += dt_w
        _, _, (cnts, st) = do_winner_stats(state[0], am)
        st = np.asarray(st)
        walked, evaled = st[:, 0], st[:, 1]
        dt_a, _ = timeit(lambda: do_analytic(state[0], state[3]))
        total["analytic"] += dt_a
        step = make_bounce(bounce)
        dt_b, new_state = timeit(lambda: step(state, pid, b0, b1))
        total["bounce"] += dt_b
        nz = counts[counts > 0]
        line += (f"  wl {dt_wl*1e3:6.1f}  win {dt_w*1e3:7.1f}"
                 f"  ana {dt_a*1e3:6.1f}  bounce {dt_b*1e3:7.1f}"
                 f"  listed {nz.mean() if len(nz) else 0:5.1f}"
                 f" walked {walked.mean():5.1f} evaled {evaled.mean():5.1f}"
                 f" nzblk {len(nz)}/{len(counts)}")
        print(line, flush=True)
        state = new_state

    print("\ntotals (ms, x2 chunks for full 32spp bench):")
    for k, v in total.items():
        print(f"  {k:9s} {v*1e3:8.1f}  (x2 = {2*v*1e3:8.1f})")
    other = total["bounce"] - total["winner"] - total["analytic"]
    print(f"  bounce-minus-kernels (recompute+scatter): {other*1e3:8.1f}")


if __name__ == "__main__":
    main()
