"""Ablation profiling of the render-pass bounce loop on the live device.

Methodology matters here: a dispatch+sync through the axon relay costs
~27 ms RTT, so every phase is looped R times INSIDE one jit program, synced
once, and reported net of the measured no-op RTT. Phase costs below are
true device time per iteration at the bench wavefront (512x512 rays).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingthenextweekcuda_tpu.config import RenderConfig, INFINITY
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models import camera as camera_mod
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops.materials import scatter
from raytracingthenextweekcuda_tpu.ops import linalg
from raytracingthenextweekcuda_tpu.ops.rays import Rays

scene, camera = presets.cornell_box()
scene = finalize(scene)
cfg = RenderConfig(width=512, height=512, spp=16, bounces=10, spp_per_pass=16)
N = cfg.num_pixels
frame = camera_mod.derive(camera, cfg.aspect_ratio)
key = jax.random.key(0)
rays, ray_keys = camera_mod.generate_rays(frame, key, cfg.width, cfg.height)
rays = jax.block_until_ready(rays)

def sync(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0]))

R = 128
RTT = None

def timeit(name, body, init, reps=3, r=R):
    """body(carry, i) -> carry, looped r times inside one jit."""
    def prog(c):
        return jax.lax.scan(lambda a, i: (body(a, i), None), c, jnp.arange(r))[0]
    f = jax.jit(prog)
    sync(f(init))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); sync(f(init))
        best = min(best, time.perf_counter() - t0)
    net = (best * 1000 - (RTT or 0.0))
    print(f"{name:46s} {net / r:9.4f} ms/iter  (gross {best*1000:7.1f} ms)")
    return best * 1000

RTT = 0.0
RTT = timeit("[control] no-op RTT", lambda c, i: c * 1.0000001, jnp.zeros((8, 128)), r=1)

alive = jnp.ones((N,), bool)

def intersect_body(c, i):
    r = Rays(origin=c, direction=rays.direction, time=rays.time)
    hit = integrator.intersect_scene(scene, r, cfg.tmin, INFINITY, alive=alive)
    return c + hit.normal * 1e-30 + hit.t[:, None] * 1e-30
timeit("intersect_scene (kernel + winner lookup)", intersect_body, rays.origin)

from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import intersect_packed
def kernel_body(c, i):
    r = Rays(origin=c, direction=rays.direction, time=rays.time)
    t, code = intersect_packed(r, scene.packed, cfg.tmin)
    return c + t[:, None] * 1e-30 + code[:, None] * 1e-30
timeit("raw intersect kernel", kernel_body, rays.origin)

hit0 = jax.jit(lambda r: integrator.intersect_scene(scene, r, cfg.tmin, INFINITY))(rays)
hit0 = jax.block_until_ready(hit0)

def gather_body(c, i):
    mat = scene.materials.gather(hit0.material_id + (c[0, 0] * 1e-30).astype(jnp.int32))
    return c + mat.albedo * 1e-30 + mat.emission * 1e-30
timeit("materials.gather", gather_body, jnp.zeros((N, 3)))

mat0 = jax.jit(lambda h: scene.materials.gather(h.material_id))(hit0)
mat0 = jax.block_until_ready(mat0)
used_kinds = scene.packed.used_kinds

def scatter_body(c, i):
    bkeys = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(ray_keys)
    s = scatter(bkeys, rays, hit0, mat0, used_kinds)
    return c + s.direction * 1e-30 + s.attenuation * 1e-30
timeit("fold_in + scatter", scatter_body, jnp.zeros((N, 3)))

def rng_body(c, i):
    bkeys = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(ray_keys)
    u = jax.vmap(lambda k: jax.random.uniform(k, (9,)))(bkeys)
    return c + u[:, :3] * 1e-30
timeit("RNG alone: per-ray fold_in + uniform(9,)", rng_body, jnp.zeros((N, 3)))

def rng4_body(c, i):
    bkeys = jax.vmap(lambda k: jax.random.fold_in(k, i + 1))(ray_keys)
    u = jax.vmap(lambda k: jax.random.uniform(k, (4,)))(bkeys)
    return c + u[:, :3] * 1e-30
timeit("RNG alone: per-ray fold_in + uniform(4,)", rng4_body, jnp.zeros((N, 3)))

# full render pass for reference (16 spp x 10 bounces inside)
def pass_body(c, i):
    img = integrator.render_pass(scene, camera, jax.random.fold_in(key, i), cfg, 16)
    return c + img * 1e-30
timeit("render_pass(16 spp) [= 160 bounces]", pass_body, jnp.zeros((512, 512, 3)), r=4)
