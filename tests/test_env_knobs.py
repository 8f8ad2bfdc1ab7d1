"""Correctness coverage for the RTNW_* tuning knobs.

Every PERFORMANCE knob must leave the rendered image unchanged (they alter
schedules, not math): RTNW_WINNER_BLOCK (consensus block size),
RTNW_LEAF (tile-BVH leaf size). The ablation-only flags (RTNW_NO_PRUNE,
RTNW_DEBUG_*) are covered by their warnings + the winner-kernel tests.
The full knob inventory lives in config.py's docstring.
"""

import os

import numpy as np
import pytest

import jax

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import integrator
from raytracingthenextweekcuda_tpu.models.scene import SceneBuilder, finalize
from raytracingthenextweekcuda_tpu.io.procedural import uv_sphere_mesh

CFG = RenderConfig(width=24, height=24, spp=2, bounces=4, spp_per_pass=2)


def _mesh_scene():
    b = SceneBuilder()
    b.lambertian(0, (0.7, 0.4, 0.3))
    b.lambertian(1, (0.8, 0.8, 0.8))
    b.mesh(uv_sphere_mesh(0.8, (0.0, 0.0, -1.5), 12, 24), 0)
    b.plane((0.0, -0.9, 0.0), (0.0, 1.0, 0.0), (50.0, 0.0, 50.0), 2, 1)
    return b.build()


def _render(scene, camera=None):
    from raytracingthenextweekcuda_tpu.models.camera import Camera

    camera = camera or Camera.make(
        eye=(0.0, 0.3, 1.0), center=(0.0, 0.0, -1.5), fov=55.0,
        aperture=0.0, focus_distance=2.5,
    )
    return np.asarray(
        integrator.render(scene, camera, CFG, key=jax.random.key(5)).mean
    )


@pytest.mark.parametrize("block", [256, 512])
def test_winner_block_size_is_image_invariant(block, monkeypatch):
    """RTNW_WINNER_BLOCK changes the consensus granularity only: the
    per-ray slab prune + closest-t winner make any block size produce the
    same hits, so images are bit-identical."""
    base_scene = finalize(_mesh_scene(), use_bvh=True)
    ref = _render(base_scene)
    monkeypatch.setenv("RTNW_WINNER_BLOCK", str(block))
    img = _render(base_scene)
    np.testing.assert_array_equal(img, ref)


@pytest.mark.parametrize("leaf", [256, 64])
def test_leaf_size_is_image_invariant(leaf, monkeypatch):
    """RTNW_LEAF regroups triangles into different lane tiles; winners are
    closest-t either way, so the image matches the default-leaf render
    (exactly, up to distinct-t winner ties, which this scene lacks)."""
    ref = _render(finalize(_mesh_scene(), use_bvh=True))
    monkeypatch.setenv("RTNW_LEAF", str(leaf))
    scene = finalize(_mesh_scene(), use_bvh=True)
    assert scene.packed.trih.shape[1] // scene.packed.leaf_bounds.shape[1] \
        == leaf
    img = _render(scene)
    np.testing.assert_allclose(img, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dirbits", [0, 3])
def test_key_dirbits_is_image_invariant(dirbits, monkeypatch):
    """RTNW_KEY_DIRBITS reshuffles the coherence-sort key only (sorting is
    a permutation and the per-pixel counter RNG rides it), so any setting
    renders bit-identically to the default. The flag is read at TRACE
    time, so the cache is cleared to force a retrace under the new value
    (same reason sweeps need fresh processes)."""
    scene = finalize(_mesh_scene(), use_bvh=True)
    ref = _render(scene)
    monkeypatch.setenv("RTNW_KEY_DIRBITS", str(dirbits))
    jax.clear_caches()
    try:
        img = _render(scene)
    finally:
        monkeypatch.undo()
        jax.clear_caches()
    np.testing.assert_array_equal(img, ref)
