"""Fused Pallas scene intersect (interpret mode on CPU) vs the pure-XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import camera as cam_mod
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize
from raytracingthenextweekcuda_tpu.ops.fused import intersect_scene_fused, pack_scene
from raytracingthenextweekcuda_tpu.ops.rays import Rays

INF = float("inf")


def cornell_rays(n_side=48, key=0):
    scene, camera = presets.cornell_box()
    frame = cam_mod.derive(camera, 1.0)
    rays, _ = cam_mod.generate_rays(frame, jax.random.key(key), n_side, n_side)
    return scene, rays


def _compare_hits(reference, fused, rtol=1e-4):
    rv, fv = np.asarray(reference.valid), np.asarray(fused.valid)
    np.testing.assert_array_equal(rv, fv)
    v = rv
    np.testing.assert_allclose(
        np.asarray(reference.t)[v], np.asarray(fused.t)[v], rtol=rtol, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(reference.material_id), np.asarray(fused.material_id)
    )
    np.testing.assert_allclose(
        np.asarray(reference.normal)[v], np.asarray(fused.normal)[v], atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(reference.front_face), np.asarray(fused.front_face)
    )
    assert v.mean() > 0.3  # cornell interior: most rays hit


def test_fused_matches_reference_cornell():
    scene, rays = cornell_rays()
    packed = pack_scene(scene)
    ref = integrator.intersect_scene(scene, rays, 1e-3, INF)  # packed=None path
    fused = intersect_scene_fused(scene, packed, rays, 1e-3, interpret=True)
    _compare_hits(ref, fused)


def test_fused_matches_on_random_soup_scene():
    rng = np.random.default_rng(0)
    from raytracingthenextweekcuda_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    b.lambertian(0, (0.5, 0.5, 0.5))
    for i in range(150):  # >128 -> exercises multi-tile sphere loop
        c = rng.uniform(-2, 2, 3)
        b.sphere(c, rng.uniform(0.1, 0.4), 0)
    b.moving_sphere((0, 0, 0), (0, 1, 0), 0.0, 1.0, 0.3, 0)
    b.plane((0, -2.5, 0), (0, 1, 0), (5, 0, 5), 2, 0)
    scene = b.build()

    n = 1024
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    target = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(rng.random(n), jnp.float32))

    packed = pack_scene(scene)
    ref = integrator.intersect_scene(scene, rays, 1e-3, INF)
    fused = intersect_scene_fused(scene, packed, rays, 1e-3, interpret=True)
    _compare_hits(ref, fused)


def test_finalized_render_matches_fallback():
    scene, camera = presets.cornell_box()
    cfg = RenderConfig(width=16, height=16, spp=2, bounces=4, spp_per_pass=2)
    key = jax.random.key(3)
    plain = integrator.render_pass(scene, camera, key, cfg, 2)
    packed_scene = finalize(scene)
    assert packed_scene.packed is not None
    fused = integrator.render_pass(packed_scene, camera, key, cfg, 2)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(fused), rtol=1e-4, atol=1e-4
    )


def test_fused_gradients_flow():
    """Gradient of hit distance wrt sphere center through the fused path.

    (Image-mean FD would include visibility-discontinuity terms that
    fixed-topology gradients intentionally exclude, so we test the
    continuous quantity: sum of hit t over a fixed winner set.)
    """
    scene, rays = cornell_rays(n_side=16, key=5)
    base_hit = intersect_scene_fused(scene, pack_scene(scene), rays, 1e-3, interpret=True)
    sphere_mask = jnp.asarray(
        np.asarray(base_hit.valid)
        & np.isin(np.asarray(base_hit.material_id), [6, 7])
    )
    assert bool(sphere_mask.sum() > 0)

    def loss(cz):
        s = scene._replace(
            spheres=scene.spheres._replace(
                center0=scene.spheres.center0.at[0, 2].set(cz),
                center1=scene.spheres.center1.at[0, 2].set(cz),
            )
        )
        hit = intersect_scene_fused(s, pack_scene(s), rays, 1e-3, interpret=True)
        return jnp.sum(jnp.where(sphere_mask, hit.t, 0.0))

    cz0 = float(scene.spheres.center0[0, 2])
    g = jax.grad(loss)(jnp.float32(cz0))
    fd = (loss(jnp.float32(cz0 + 1e-3)) - loss(jnp.float32(cz0 - 1e-3))) / 2e-3
    assert np.isfinite(np.asarray(g))
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=2e-2, atol=1e-2)
