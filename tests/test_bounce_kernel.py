"""Fused bounce megastep (ops/pallas/bounce_kernel.py) vs the XLA wavefront
engine: identical RNG stream, so images must agree to float tolerance on
every preset; differentiating the fused path must fail loudly."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize

PRESETS = {
    "sphere_plane": presets.diffuse_sphere_plane,
    "cornell": presets.cornell_box,
    "defocus": presets.defocus_blur,
    "smallpt": presets.smallpt_spheres,  # Path B kinds incl. COAT/REFRACTION
    "mesh": presets.mesh_showcase,
}


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_fused_bounce_matches_wavefront(name):
    scene, camera = PRESETS[name]()
    scene = finalize(scene, use_bvh=False)
    assert scene.packed is not None and scene.packed.shaded
    cfg = RenderConfig(width=24, height=24, spp=4, bounces=6, spp_per_pass=4)
    key = jax.random.key(7)
    fused = np.asarray(integrator.render_pass(scene, camera, key, cfg, 4))
    xla = np.asarray(
        integrator.render_pass(
            scene, camera, key,
            dataclasses.replace(cfg, fused_bounce=False), 4,
        )
    )
    assert np.isfinite(fused).all()
    if name == "smallpt":
        # smallpt's 1e5-radius wall spheres sit at the edge of f32: a point
        # on such a sphere has ~0.01 absolute position uncertainty (ulp at
        # 1e5), so the two engines' per-bounce hit points differ in the last
        # ulps every bounce and a small fraction of paths diverge discretely
        # (measured: 1.3% of pixels differ > 0.2 at 6 bounces, image mean
        # agrees to 0.04%). Per-pixel equality is not achievable at this
        # scale in f32 — compare as two estimators of the same integral.
        diff = np.abs(fused - xla)
        assert (diff > 0.2).mean() < 0.05, f"{(diff > 0.2).mean():.2%} off"
        np.testing.assert_allclose(fused.mean(), xla.mean(), rtol=1e-2)
    else:
        np.testing.assert_allclose(fused, xla, rtol=1e-4, atol=1e-4)


def test_fused_bounce_russian_roulette_matches():
    scene, camera = presets.cornell_box()
    scene = finalize(scene, use_bvh=False)
    cfg = RenderConfig(width=16, height=16, spp=4, bounces=8, spp_per_pass=4,
                       russian_roulette=True, rr_start_bounce=2)
    key = jax.random.key(3)
    fused = np.asarray(integrator.render_pass(scene, camera, key, cfg, 4))
    xla = np.asarray(
        integrator.render_pass(
            scene, camera, key,
            dataclasses.replace(cfg, fused_bounce=False), 4,
        )
    )
    np.testing.assert_allclose(fused, xla, rtol=1e-4, atol=1e-4)


def test_fused_bounce_grad_raises():
    """Differentiating a fused-bounce render fails loudly, never silently
    returning zero gradients (the custom_vjp guard in bounce_kernel)."""
    scene, camera = presets.diffuse_sphere_plane()
    scene = finalize(scene, use_bvh=False)
    cfg = RenderConfig(width=8, height=8, spp=1, bounces=2, spp_per_pass=1)

    def loss(cz):
        s = scene._replace(
            spheres=scene.spheres._replace(
                center0=scene.spheres.center0.at[0, 2].set(cz)
            )
        )
        s = finalize(s, use_bvh=False)
        img = integrator.render_pass(s, camera, jax.random.key(0), cfg, 1)
        return jnp.mean(img)

    with pytest.raises(NotImplementedError, match="fused_bounce=False"):
        jax.grad(loss)(jnp.float32(-1.0))


def test_fused_bounce_black_background():
    scene, camera = presets.cornell_box()
    scene = finalize(scene, use_bvh=False)
    cfg = RenderConfig(width=16, height=16, spp=2, bounces=4, spp_per_pass=2,
                       sky_background=False)
    key = jax.random.key(1)
    fused = np.asarray(integrator.render_pass(scene, camera, key, cfg, 2))
    xla = np.asarray(
        integrator.render_pass(
            scene, camera, key,
            dataclasses.replace(cfg, fused_bounce=False), 2,
        )
    )
    np.testing.assert_allclose(fused, xla, rtol=1e-4, atol=1e-4)


def test_merge_parallelograms_cube():
    """A cube mesh's 12 triangles merge into exactly 6 parallelogram quads;
    a lone non-parallelogram triangle is left unmerged."""
    import numpy as np

    from raytracingthenextweekcuda_tpu.io.procedural import cube_mesh
    from raytracingthenextweekcuda_tpu.ops.pallas.bounce_kernel import (
        _merge_parallelograms,
    )

    tris = np.asarray(cube_mesh(0.5, (0.0, 0.0, 0.0)), np.float32)
    mats = np.zeros((tris.shape[0],), np.int32)
    qv0, qe1, qe2, qmat, rest = _merge_parallelograms(tris, mats)
    assert qv0.shape[0] == 6 and rest.shape[0] == 0

    # Append a skewed triangle: stays a triangle.
    skew = np.asarray(
        [[[5.0, 0.0, 0.0], [6.0, 0.0, 0.0], [5.0, 1.3, 0.7]]], np.float32
    )
    tris2 = np.concatenate([tris, skew])
    mats2 = np.zeros((13,), np.int32)
    qv0, _, _, _, rest = _merge_parallelograms(tris2, mats2)
    assert qv0.shape[0] == 6 and rest.shape[0] == 1

    # Different materials across the shared edge block merging.
    mats3 = np.arange(12, dtype=np.int32)
    qv0, _, _, _, rest = _merge_parallelograms(tris, mats3)
    assert qv0.shape[0] == 0 and rest.shape[0] == 12
