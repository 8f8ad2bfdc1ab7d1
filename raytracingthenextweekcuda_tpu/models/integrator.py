"""Megakernel-free wavefront path tracer.

The reference renders with a per-pixel megakernel: renderKernel
(main.cu:160-206) loops spp x bounces per thread, calling pathTrace
(CUDAPathTracer.cu:358-622) with divergent branches, per-thread BVH stacks
and rejection-sampled RNG. Here the whole image is one ray wavefront: a
`lax.scan` over bounces carries (origin, direction, throughput, radiance,
alive) SoA state, every phase (intersect-all, scatter-all) is a batched
VPU/MXU-friendly op, and spp accumulates over passes. Bounce semantics match
Path A's `rayColor` (main.cu:63-94):

  hit + scatter      -> throughput *= attenuation, continue
  hit + no scatter   -> radiance += throughput * emitted (emission term or
                        metal absorption zero), terminate
  miss               -> radiance += throughput * sky gradient, terminate
  bounce exhaustion  -> contribute black

Russian roulette is a config extension (reference TODO CUDAPathTracer.cu:532).
Everything is differentiable wrt scene + camera parameters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytracingthenextweekcuda_tpu.config import INFINITY, RenderConfig
from raytracingthenextweekcuda_tpu.models import camera as camera_mod
from raytracingthenextweekcuda_tpu.models.film import Film
from raytracingthenextweekcuda_tpu.models.scene import Scene
from raytracingthenextweekcuda_tpu.ops import intersect, linalg, rng
from raytracingthenextweekcuda_tpu.ops.materials import scatter
from raytracingthenextweekcuda_tpu.ops.rays import Hit, Rays, closer

SKY_WHITE = (1.0, 1.0, 1.0)
SKY_BLUE = (0.5, 0.7, 1.0)

# Multi-sample sorted wavefronts are capped at this many rays (18 planar f32
# rows each -> ~300 MB of HBM at the cap, x2 transiently during the sort).
_SORT_WAVEFRONT_CAP = 4 * 1024 * 1024
# ... and at this many samples per wavefront: _trace_sorted rebuilds each
# ray's per-sample RNG base words with a select chain of length g over the
# full wavefront every bounce, so unbounded g (tiny images at the ray cap)
# would make that chain dominate the bounce and bloat the traced program.
# 64 samples already gives the sort full cross-sample compaction leverage.
_SORT_SAMPLE_GROUP_CAP = 64


def sky_color(direction: jnp.ndarray) -> jnp.ndarray:
    """RTiOW sky gradient on the unit direction (main.cu:86-89)."""
    unit = linalg.normalize(direction)
    t = 0.5 * (unit[..., 1] + 1.0)
    white = jnp.asarray(SKY_WHITE, direction.dtype)
    blue = jnp.asarray(SKY_BLUE, direction.dtype)
    return linalg.lerp(white, blue, t[..., None])


def intersect_scene(scene: Scene, rays: Rays, tmin, tmax, alive=None) -> Hit:
    """Closest hit across all primitive batches.

    Three regimes, all semantics-identical:
    * packed (scene.packed set, via models.scene.finalize): one fused Pallas
      kernel over all primitive types — the production TPU path; all
      intermediates stay in VMEM.
    * BVH (scene.bvh set): packed kernel for spheres/planes + LBVH traversal
      for large triangle meshes.
    * fallback: pure-XLA batched intersects (also the CPU/test oracle).

    The per-type empty checks are static (trace-time) shape tests, so absent
    primitive types compile to nothing — the analogue of null entries in the
    reference's `constantObjects` table (main.cu:47-49).
    """
    if scene.packed is not None:
        from raytracingthenextweekcuda_tpu.ops.fused import intersect_scene_fused

        hit = intersect_scene_fused(
            scene, scene.packed, rays, tmin,
            interpret=jax.default_backend() == "cpu", alive=alive,
        )
        if scene.bvh is not None and scene.triangles.count:
            # Two-level dispatch: fused kernel covers analytic primitives
            # (the packed arrays exclude triangles, see finalize), LBVH/SAH
            # traversal covers the mesh.
            from raytracingthenextweekcuda_tpu.ops import traverse

            hit = closer(
                hit,
                traverse.intersect_bvh(rays, scene.triangles, scene.bvh, tmin, tmax),
            )
        return hit

    hit = Hit.none(rays.count)
    if scene.spheres.count:
        hit = closer(hit, intersect.intersect_spheres(rays, scene.spheres, tmin, tmax))
    if scene.planes.count:
        hit = closer(hit, intersect.intersect_planes(rays, scene.planes, tmin, tmax))
    if scene.triangles.count:
        if scene.bvh is not None:
            from raytracingthenextweekcuda_tpu.ops import traverse

            hit = closer(
                hit, traverse.intersect_bvh(rays, scene.triangles, scene.bvh, tmin, tmax)
            )
        else:
            hit = closer(
                hit,
                intersect.intersect_triangles(rays, scene.triangles, tmin, tmax),
            )
    return hit


def _grad_probe(scene: Scene) -> jnp.ndarray:
    """Grad guard for the forward-only fused engines.

    pack_scene stop-gradients the packed arrays (the selection kernel needs
    that on the differentiable path), so differentiating a fused render wrt
    scene parameters would SILENTLY yield zero gradients. This probe is
    exactly 0.0 in the primal but carries the scene-parameter tangents into
    a custom_vjp whose bwd raises, pointing at cfg.fused_bounce=False.
    """
    from raytracingthenextweekcuda_tpu.ops.pallas.bounce_kernel import (
        _forward_only,
    )

    probe = sum(
        jnp.sum(leaf)
        for leaf in jax.tree_util.tree_leaves(
            (scene.spheres, scene.planes, scene.triangles, scene.materials)
        )
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )
    probe = _forward_only(probe)
    return probe - jax.lax.stop_gradient(probe)


def _trace_fused(scene: Scene, rays: Rays, ctx, cfg: RenderConfig) -> jnp.ndarray:
    """Fused-path trace: the ENTIRE bounce loop runs in ONE Pallas kernel
    (ops/pallas/bounce_kernel._path_kernel) — wavefront state stays in VMEM
    across bounces, per-bounce uniforms are generated in-register, and each
    1024-ray block exits the loop as soon as all its rays terminate.
    Consumes the same per-(pixel, bounce) pcg4d stream as the XLA path
    below, so the two engines agree to float tolerance. Forward-only (see
    cfg.fused_bounce).
    """
    from raytracingthenextweekcuda_tpu.ops.pallas.bounce_kernel import (
        path_trace,
    )

    interpret = jax.default_backend() == "cpu"
    radiance = path_trace(
        scene, scene.packed, rays, ctx, cfg, interpret=interpret
    )
    return radiance + _grad_probe(scene)


def _fused_eligible(scene: Scene, cfg: RenderConfig) -> bool:
    """Static test: the megastep covers the whole scene (trace-time check)."""
    return (
        cfg.fused_bounce
        and scene.packed is not None
        and getattr(scene.packed, "shaded", False)
        and scene.bvh is None
    )


def _sorted_eligible(scene: Scene, cfg: RenderConfig) -> bool:
    """Static test: tile-BVH scene rendered via the winner-kernel wavefront.

    Tile-BVH scenes bounce through the work-list winner kernel
    (ops/pallas/bvh_winner_kernel.py) inside the standard differentiable
    XLA bounce, with a coherence sort between bounces
    (ops/wavefront_sort.py): the per-block leaf work lists shrink only when
    ray blocks stay spatially coherent, and only re-sorted wavefronts
    stay coherent past the first diffuse bounce. Unlike the fused megastep
    this path is differentiable, so it serves forward AND inverse rendering
    on meshes.

    ALL tile-BVH scenes route here — cfg.sort_rays toggles only the
    between-bounce sort, not the engine. (The megastep's in-kernel
    consensus-BVH traversal remains as an independent oracle engine for
    the cross-engine identity tests, but its wide-leaf tiles overflow
    scoped VMEM on real TPUs at production sizes, so production never
    routes to it for mesh scenes.)
    """
    return (
        scene.packed is not None
        and getattr(scene.packed, "shaded", False)
        and getattr(scene.packed, "leaf_bounds", None) is not None
        and scene.bvh is None
    )


def _trace_sorted(scene: Scene, rays: Rays, ctx, cfg: RenderConfig,
                  sample_tables=None, shutter=None) -> jnp.ndarray:
    """Sorted-wavefront trace for tile-BVH scenes (see _sorted_eligible).

    Each bounce is the standard XLA bounce body (winner kernels + gathered
    differentiable recompute + branchless BSDF); between bounces the
    wavefront is re-sorted by direction-octant + position-morton so
    winner-kernel blocks stay spatially coherent for the per-block leaf
    work lists, with dead rays clustering into whole skipped blocks. The
    per-(pixel, bounce) counter RNG rides through the sort, so the result
    is bit-identical to the unsorted XLA trace (elementwise math is
    row-independent; sort + unsort is a permutation).

    The multi-operand sort is HBM-bandwidth-bound, so the payload is
    minimized. With `sample_tables`=(tb0, tb1) per-sample key-word tables
    and `shutter`=(time0, time1) — the render_pass multi-sample layout,
    where ray s*num_pixels + p is sample s, pixel p — ONLY ONE int32 row
    (the original slot) rides beyond the 13 float rows of ray state:
    pixel id and sample index are arithmetic functions of slot, base
    words come from the tiny tables, and ray time is recomputed from the
    raygen hash (rng.shutter_uniform — a pure function of (pixel, key),
    so bit-identical). Without tables, pixel ids ride as a row and time
    rides when bases are per-ray (the generic path).
    """
    from raytracingthenextweekcuda_tpu.ops.wavefront_sort import (
        DEAD_KEY,
        ray_sort_key,
        unsort_radiance,
    )

    packed = scene.packed
    n = rays.count
    dtype = rays.origin.dtype
    n_pix = cfg.num_pixels
    slot = jnp.arange(n, dtype=jnp.int32)
    lo = packed.bvh_bounds[0:3, 0]
    hi = packed.bvh_bounds[3:6, 0]

    compact = sample_tables is not None and shutter is not None
    scalar_bases = jnp.ndim(ctx.base0) == 0
    if compact:
        tb0, tb1 = sample_tables
        g = int(tb0.shape[0])

    def rebuild_ids(slot, pid_row):
        """RayCtx (+ recomputed time) for the current wavefront order."""
        if compact:
            pid = (slot % n_pix).astype(jnp.uint32)
            sid = slot // n_pix
            b0 = jnp.broadcast_to(tb0[0], (n,))
            b1 = jnp.broadcast_to(tb1[0], (n,))
            for s in range(1, g):  # tiny static table: select chain
                b0 = jnp.where(sid == s, tb0[s], b0)
                b1 = jnp.where(sid == s, tb1[s], b1)
            ctx_b = rng.RayCtx(pid, b0, b1)
            t0s, t1s = shutter
            time = rng.shutter_uniform(ctx_b) * (t1s - t0s) + t0s
            return ctx_b, time
        return rng.RayCtx(pid_row.astype(jnp.uint32), ctx.base0,
                          ctx.base1), None

    state = (
        rays,
        jnp.ones((n, 3), dtype),   # throughput
        jnp.zeros((n, 3), dtype),  # radiance
        jnp.ones((n,), bool),      # alive
    )
    if compact:
        carry = (state, slot)
    elif scalar_bases:
        carry = (state, ctx.pixel_id.astype(jnp.int32), slot)
    else:
        carry = (state, ctx.pixel_id.astype(jnp.int32), slot,
                 jnp.broadcast_to(ctx.base0, (n,)).astype(jnp.int32),
                 jnp.broadcast_to(ctx.base1, (n,)).astype(jnp.int32))

    def step(carry, bounce_idx):
        state = carry[0]
        if compact:
            ctx_b, _ = rebuild_ids(carry[1], None)
        elif scalar_bases:
            ctx_b, _ = rebuild_ids(None, carry[1])
        else:
            ctx_b = rng.RayCtx(carry[1].astype(jnp.uint32),
                               carry[3].astype(jnp.uint32),
                               carry[4].astype(jnp.uint32))
        state = _bounce_body(scene, cfg, state, ctx_b, bounce_idx)
        return (state, *carry[1:])

    def sort_then_step(carry, bounce_idx):
        state = carry[0]
        rays_b, throughput, radiance, alive = state
        key = ray_sort_key(
            rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
            rays_b.direction[:, 0], rays_b.direction[:, 1],
            rays_b.direction[:, 2],
            alive.astype(jnp.int32), lo, hi,
        )
        # ONE multi-operand unstable sort moves the whole planar state
        # (argsort + per-row gathers serialize per lane on TPU). The
        # alive row rides for free as the sorted key itself — dead rays
        # carry DEAD_KEY by construction (ops/wavefront_sort.ray_sort_key).
        rows = (
            rays_b.origin[:, 0], rays_b.origin[:, 1], rays_b.origin[:, 2],
            rays_b.direction[:, 0], rays_b.direction[:, 1],
            rays_b.direction[:, 2],
            throughput[:, 0], throughput[:, 1], throughput[:, 2],
            radiance[:, 0], radiance[:, 1], radiance[:, 2],
        )
        if not compact:
            rows = rows + (rays_b.time,)
        out = jax.lax.sort((key, *rows, *carry[1:]),
                           num_keys=1, is_stable=False)
        key_s = out[0]
        aux = out[1 + len(rows):]
        if compact:
            _, time = rebuild_ids(aux[0], None)
        else:
            time = out[len(rows)]  # rode the sort
        state = (
            Rays(origin=jnp.stack(out[1:4], axis=-1),
                 direction=jnp.stack(out[4:7], axis=-1),
                 time=time),
            jnp.stack(out[7:10], axis=-1),
            jnp.stack(out[10:13], axis=-1),
            key_s != DEAD_KEY,
        )
        return step((state, *aux), bounce_idx)

    stride = max(1, int(getattr(cfg, "sort_stride", 1)))

    def body(carry, bounce_idx):
        if not cfg.sort_rays:
            # Sort disabled: same engine, unsorted wavefront (lists are
            # built from whatever spatial coherence the rays retain).
            do = lambda c: step(c, bounce_idx)
        elif stride == 1:
            do = lambda c: sort_then_step(c, bounce_idx)
        else:
            def do(c):
                return jax.lax.cond(
                    (bounce_idx - 1) % jnp.uint32(stride) == 0,
                    lambda cc: sort_then_step(cc, bounce_idx),
                    lambda cc: step(cc, bounce_idx),
                    c,
                )
        # Whole-wavefront early-out, as in trace()'s bounce_or_skip.
        return jax.lax.cond(
            jnp.any(carry[0][3]), do, lambda c: c, carry,
        ), None

    # Primary rays arrive in pixel order (already coherent): bounce first,
    # sort from the second bounce on.
    carry = step(carry, jnp.uint32(0))
    if cfg.bounces > 1:
        carry, _ = jax.lax.scan(
            body, carry, jnp.arange(1, cfg.bounces, dtype=jnp.uint32)
        )
    radiance = carry[0][2]
    slot = carry[1] if compact else carry[2]
    return unsort_radiance(
        slot, radiance[:, 0], radiance[:, 1], radiance[:, 2], n
    )


def _bounce_body(scene: Scene, cfg: RenderConfig, state, ctx, bounce_idx):
    """One XLA wavefront bounce: intersect + gather + scatter + bookkeeping.

    `state` = (rays, throughput (N,3), radiance (N,3), alive (N,) bool);
    `ctx` the per-ray RNG context; `bounce_idx` traced uint32. Returns the
    advanced state. Shared by trace() (fixed wavefront order) and
    _trace_sorted (per-bounce coherence-sorted order — every op here is
    row-independent, so the two agree bit-for-bit after unsorting).
    """
    rays_b, throughput, radiance, alive = state
    n = rays_b.count
    dtype = rays_b.origin.dtype

    hit = intersect_scene(scene, rays_b, cfg.tmin, INFINITY, alive=alive)
    mat = scene.materials.gather(hit.material_id)
    # Static kind set (recorded at pack time) prunes absent BSDF branches.
    used_kinds = getattr(scene.packed, "used_kinds", None)
    # One (N, 4) uniform block per bounce covers every scatter draw
    # (slots 0-2, see ops.materials.scatter) plus Russian roulette
    # (slot 3) — a single pcg4d sweep instead of one hash per draw.
    u4 = rng.bounce_uniforms(ctx, bounce_idx)
    scat = scatter(u4, rays_b, hit, mat, used_kinds)

    if cfg.sky_background:
        sky = sky_color(rays_b.direction)
    else:
        sky = jnp.zeros((n, 3), dtype)

    miss = alive & ~hit.valid
    terminal = alive & hit.valid & ~scat.scattered
    radiance = radiance + jnp.where(miss[..., None], throughput * sky, 0.0)
    radiance = radiance + jnp.where(
        terminal[..., None], throughput * scat.emitted, 0.0
    )
    # Path B additive emission: every hit releases mask*emit and the
    # path continues (CUDAPathTracer.cu:430,449). Zero for Path A
    # materials, so this is free there.
    radiance = radiance + jnp.where(
        (alive & hit.valid)[..., None], throughput * mat.emission, 0.0
    )

    cont = alive & hit.valid & scat.scattered
    new_throughput = jnp.where(
        cont[..., None], throughput * scat.attenuation, throughput
    )

    if cfg.russian_roulette:
        p = jnp.clip(jnp.max(new_throughput, axis=-1), 0.05, 1.0)
        p = jax.lax.stop_gradient(p)
        u = u4[:, 3]  # reserved RR slot, decorrelated from slots 0-2
        do_rr = bounce_idx >= cfg.rr_start_bounce
        survive = ~do_rr | (u < p)
        new_throughput = jnp.where(
            (cont & do_rr & survive)[..., None],
            new_throughput / p[..., None],
            new_throughput,
        )
        cont = cont & survive

    safe_t = jnp.where(hit.valid, hit.t, 0.0)
    hit_point = rays_b.at(safe_t)
    new_rays = Rays(
        origin=jnp.where(cont[..., None], hit_point, rays_b.origin),
        direction=jnp.where(cont[..., None], scat.direction, rays_b.direction),
        time=rays_b.time,
    )
    return (new_rays, new_throughput, radiance, cont)


def trace(scene: Scene, rays: Rays, ctx, cfg: RenderConfig) -> jnp.ndarray:
    """Path-trace a wavefront to completion. Returns radiance (N, 3).

    `ctx` is the per-ray RNG context (camera.ray_context); each bounce hashes
    the bounce index in, so every random draw is a pure function of
    (seed, pass, pixel, bounce) — independent of device placement.
    """
    if _sorted_eligible(scene, cfg):
        return _trace_sorted(scene, rays, ctx, cfg)
    if _fused_eligible(scene, cfg):
        return _trace_fused(scene, rays, ctx, cfg)

    n = rays.count
    dtype = rays.origin.dtype

    state = (
        rays,
        jnp.ones((n, 3), dtype),   # throughput
        jnp.zeros((n, 3), dtype),  # radiance
        jnp.ones((n,), bool),      # alive
    )

    def bounce(state, bounce_idx):
        return _bounce_body(scene, cfg, state, ctx, bounce_idx), None

    # Path A runs a fixed 10-bounce loop with per-thread early returns
    # (main.cu:66-93); the wavefront equivalent skips a whole bounce once
    # every ray has terminated. lax.cond (scalar predicate) executes only
    # the taken branch at runtime, and — unlike lax.while_loop — stays
    # reverse-mode differentiable for the inverse-rendering path.
    def bounce_or_skip(state, bounce_idx):
        return jax.lax.cond(
            jnp.any(state[3]),
            lambda s: bounce(s, bounce_idx)[0],
            lambda s: s,
            state,
        ), None

    (_, _, radiance, _), _ = jax.lax.scan(
        bounce_or_skip, state, jnp.arange(cfg.bounces)
    )
    return radiance


@functools.partial(jax.jit, static_argnames=("cfg", "samples"))
def render_pass(scene: Scene, camera: camera_mod.Camera, key, cfg: RenderConfig, samples: int) -> jnp.ndarray:
    """Trace `samples` spp and return the summed radiance image (H, W, 3).

    Samples run as a `lax.scan` so HBM holds one wavefront at a time
    regardless of spp — the analogue of the reference's per-frame 1-spp
    progressive loop (main.cu:883-885), batched per pass.

    When the scene is fused-eligible the ENTIRE pass (raygen + all samples
    + all bounces) runs as ONE whole-render Pallas kernel instead
    (ops/pallas/bounce_kernel.render_samples) — per-sample wavefront state
    never touches HBM.
    """
    frame = camera_mod.derive(camera, cfg.aspect_ratio)
    sample_keys = jax.random.split(key, samples)

    if _fused_eligible(scene, cfg) and not _sorted_eligible(scene, cfg):
        from raytracingthenextweekcuda_tpu.ops.pallas.bounce_kernel import (
            render_samples,
        )

        accum = render_samples(
            scene, scene.packed, frame, sample_keys, cfg,
            interpret=jax.default_backend() == "cpu",
        )
        accum = accum + _grad_probe(scene)
        return accum.reshape(cfg.height, cfg.width, 3)

    if _sorted_eligible(scene, cfg):
        # Multi-sample wavefront: trace ALL the pass's samples as ONE sorted
        # wavefront of samples*num_pixels rays. The coherence sort then
        # clusters rays across samples (8x the material per block), the
        # per-bounce dispatch count drops from samples*bounces to bounces,
        # and dead rays from every sample compact together. Raygen is ONE
        # batched op over the whole group (generate_rays_multi), and the
        # per-sample key words go to _trace_sorted as tiny tables rather
        # than riding the wavefront sort. Capped to bound HBM (14 planar
        # f32 rows per ray).
        n = cfg.num_pixels
        # The multi-sample wavefront exists FOR the coherence sort (it
        # clusters rays across samples); unsorted, grouping only inflates
        # the per-bounce temporaries (measured: a 16-sample group's
        # (N, k) winner-gather temps blow HBM at 512x512), so trace one
        # sample per wavefront.
        if not cfg.sort_rays:
            group = 1
        else:
            group = max(1, min(samples, _SORT_WAVEFRONT_CAP // max(n, 1),
                               _SORT_SAMPLE_GROUP_CAP))
        accum = jnp.zeros((n, 3), frame.origin.dtype)
        for start in range(0, samples, group):
            g = min(group, samples - start)
            keys_g = sample_keys[start:start + g]
            rays, ctx = camera_mod.generate_rays_multi(
                frame, keys_g, cfg.width, cfg.height
            )
            radiance = _trace_sorted(
                scene, rays, ctx, cfg,
                sample_tables=rng.key_bases(keys_g),
                shutter=(frame.time0, frame.time1),
            )
            accum = accum + radiance.reshape(g, n, 3).sum(axis=0)
        return accum.reshape(cfg.height, cfg.width, 3)

    def one_sample(accum, skey):
        rays, ray_keys = camera_mod.generate_rays(frame, skey, cfg.width, cfg.height)
        radiance = trace(scene, rays, ray_keys, cfg)
        return accum + radiance, None

    accum = jnp.zeros((cfg.num_pixels, 3), frame.origin.dtype)
    accum, _ = jax.lax.scan(one_sample, accum, sample_keys)
    return accum.reshape(cfg.height, cfg.width, 3)


@functools.partial(jax.jit, static_argnames=("cfg", "samples"))
def render_gbuffer(scene: Scene, camera: camera_mod.Camera, key, cfg: RenderConfig, samples: int):
    """Render radiance + geometry AOVs (depth, normal, primary albedo).

    The G-buffer quantities are continuous functions of scene geometry,
    which makes them the practical inverse-rendering signal for *positions*:
    fixed-topology radiance gradients w.r.t. geometry are exactly zero in
    purely-diffuse scenes (radiance = product of albedos; geometry only
    selects the discrete path), so `fit` losses combine radiance with depth
    and normal terms. Also a standard denoiser/compositing feature.

    Returns dict with radiance (H,W,3) summed over samples, and
    sample-averaged depth (H,W), normal (H,W,3), albedo (H,W,3),
    hit_mask (H,W).
    """
    frame = camera_mod.derive(camera, cfg.aspect_ratio)
    sample_keys = jax.random.split(key, samples)
    n = cfg.num_pixels

    def one_sample(accum, skey):
        rays, ray_keys = camera_mod.generate_rays(frame, skey, cfg.width, cfg.height)
        hit = intersect_scene(scene, rays, cfg.tmin, INFINITY)
        mat = scene.materials.gather(hit.material_id)
        depth = jnp.where(hit.valid, hit.t, 0.0)
        radiance = trace(scene, rays, ray_keys, cfg)
        acc_rad, acc_depth, acc_norm, acc_alb, acc_mask = accum
        return (
            acc_rad + radiance,
            acc_depth + depth,
            acc_norm + hit.normal,
            acc_alb + jnp.where(hit.valid[:, None], mat.albedo, 0.0),
            acc_mask + hit.valid.astype(jnp.float32),
        ), None

    init = (
        jnp.zeros((n, 3)), jnp.zeros((n,)), jnp.zeros((n, 3)),
        jnp.zeros((n, 3)), jnp.zeros((n,)),
    )
    (rad, depth, norm, alb, mask), _ = jax.lax.scan(one_sample, init, sample_keys)
    shape2 = (cfg.height, cfg.width)
    inv = 1.0 / samples
    return {
        "radiance": rad.reshape(*shape2, 3),
        "depth": (depth * inv).reshape(shape2),
        "normal": (norm * inv).reshape(*shape2, 3),
        "albedo": (alb * inv).reshape(*shape2, 3),
        "hit_mask": (mask * inv).reshape(shape2),
    }


def render(scene: Scene, camera: camera_mod.Camera, cfg: RenderConfig, key=None) -> Film:
    """Full offline render: accumulate cfg.spp over passes into a Film."""
    if key is None:
        key = jax.random.key(cfg.seed)
    film = Film.create(cfg.width, cfg.height)
    for i, chunk in enumerate(cfg.passes()):
        pass_key = jax.random.fold_in(key, i)
        film = film.add(render_pass(scene, camera, pass_key, cfg, chunk), chunk)
    return film
