"""Round-4 profiler, dispatch-overhead-free: each phase runs K times inside
ONE jitted lax.scan, so the per-call axon relay cost (~250 ms) is amortized.
Phases are chained through their outputs (tiny perturbation feeds the next
iteration) so XLA cannot CSE or DCE the repeats.

Usage: PYTHONPATH=/root/repo python tools/profile_r4b.py [bounce_depth]
bounce_depth picks which wavefront snapshot to profile (0 = primaries,
2 = post-diffuse steady state).
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
from raytracingthenextweekcuda_tpu.models.integrator import _bounce_body
from raytracingthenextweekcuda_tpu.ops import rng
from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
    build_worklist,
    intersect_packed_bvh,
)
from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
    intersect_packed,
)
from raytracingthenextweekcuda_tpu.ops.rays import Rays
from raytracingthenextweekcuda_tpu.ops.wavefront_sort import DEAD_KEY, ray_sort_key

from tools.profile_r4 import load_scene

K = 8


def sync(x):
    jax.tree_util.tree_map(
        lambda l: jax.block_until_ready(l)
        if hasattr(l, "block_until_ready") else l, x)


def timeit_scan(make_step, init, reps=3):
    """Time K chained applications of make_step inside one jit."""

    @jax.jit
    def run(init):
        def body(c, _):
            return make_step(c), None
        out, _ = jax.lax.scan(body, init, None, length=K)
        return out

    out = run(init)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / K, out


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    S = 16
    print("device:", jax.devices()[0])
    scene, camera = load_scene()
    packed = scene.packed
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
    print(f"wavefront: {N} rays, block={block}, depth={depth}")

    dtype = rays.origin.dtype
    state = (rays, jnp.ones((N, 3), dtype), jnp.zeros((N, 3), dtype),
             jnp.ones((N,), bool))
    slot = jnp.arange(N, dtype=jnp.int32)
    lo = packed.bvh_bounds[0:3, 0]
    hi = packed.bvh_bounds[3:6, 0]

    def sort_key(rays_b, alive):
        return ray_sort_key(
            rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
            rays_b.direction[:, 0], rays_b.direction[:, 1],
            rays_b.direction[:, 2], alive.astype(jnp.int32), lo, hi)

    def do_sort(carry):
        state, pid, slot, b0, b1 = carry
        rays_b, throughput, radiance, alive = state
        key = sort_key(rays_b, alive)
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
        return (st, out[14], out[15], out[16], out[17])

    def do_bounce(carry, bounce):
        state, pid, slot, b0, b1 = carry
        ctx_b = rng.RayCtx(pid.astype(jnp.uint32), b0.astype(jnp.uint32),
                           b1.astype(jnp.uint32))
        st = _bounce_body(scene, cfg, state, ctx_b, jnp.uint32(bounce))
        return (st, pid, slot, b0, b1)

    # Advance to the requested depth with the real sort+bounce chain.
    carry = (state, pid, slot, b0, b1)
    step0 = jax.jit(lambda c: do_bounce(c, 0))
    carry = step0(carry)
    for b in range(1, depth + 1):
        f = jax.jit(lambda c, b=b: do_bounce(do_sort(c), b))
        carry = f(carry)
    sync(carry)
    state, pid, slot, b0, b1 = carry
    alive_n = int(np.asarray(jnp.sum(state[3])))
    print(f"alive at depth {depth}: {alive_n}/{N}")

    rays_b = state[0]

    # --- phase: full sort (17 operands) ---
    dt, _ = timeit_scan(do_sort, carry)
    print(f"sort x17-operand : {dt*1e3:8.2f} ms")

    # --- phase: sort key only + 2-operand sort (lower bound) ---
    def sort2(c):
        st, pid, slot, b0, b1 = c
        key = sort_key(st[0], st[3])
        k2, s2 = jax.lax.sort((key, slot), num_keys=1, is_stable=False)
        # dependency trick: fold sorted slot back into slot
        return (st, pid, jnp.where(k2 == DEAD_KEY, slot, s2), b0, b1)

    dt, _ = timeit_scan(sort2, carry)
    print(f"sort 2-operand   : {dt*1e3:8.2f} ms")

    # --- phase: worklist build ---
    def wl_step(c):
        rb, am = c
        counts, order, entry = build_worklist(
            rb.origin[:, 0], rb.origin[:, 1], rb.origin[:, 2],
            rb.direction[:, 0], rb.direction[:, 1], rb.direction[:, 2],
            am, packed.leaf_bounds, tmin=float(cfg.tmin), block=block)
        # perturb alive by a data-dependent no-op to chain iterations
        am2 = jnp.where(counts.ravel().sum() >= 0, am, am)
        return (rb, am2)

    am = state[3].astype(jnp.int32)
    dt, _ = timeit_scan(wl_step, (rays_b, am))
    print(f"worklist build   : {dt*1e3:8.2f} ms")

    # --- phase: winner kernel (incl. worklist) ---
    def win_step(c):
        rb, alive = c
        t, code = intersect_packed_bvh(rb, packed, cfg.tmin, True, False,
                                       alive=alive)
        alive2 = alive & (t > -1.0)
        return (rb, alive2)

    dt, _ = timeit_scan(win_step, (rays_b, state[3]))
    print(f"winner (wl+kern) : {dt*1e3:8.2f} ms")

    # --- phase: analytic packed kernel ---
    def ana_step(c):
        rb, alive = c
        t, code = intersect_packed(rb, packed, cfg.tmin, True, False,
                                   alive=alive, include_triangles=False)
        return (rb, alive & (t > -1.0))

    dt, _ = timeit_scan(ana_step, (rays_b, state[3]))
    print(f"analytic kernel  : {dt*1e3:8.2f} ms")

    # --- phase: full bounce body ---
    def bounce_step(c):
        return do_bounce(c, depth + 1)

    dt, _ = timeit_scan(bounce_step, carry)
    print(f"full bounce      : {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
