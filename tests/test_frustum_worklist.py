"""Packet-frustum work-list builder: the large-mesh scaling path.

Above FRUSTUM_LEAF_THRESHOLD leaves the exact O(rays x leaves) work-list
build is replaced by a conservative O(blocks x leaves) interval pass
(ops/pallas/bvh_winner_kernel._build_worklist_frustum). Correctness
contract: per block the frustum list is a SUPERSET of the exact hit-any
union (the winner kernel's per-ray slab prune rejects the extras), so the
rendered image is identical. Both halves are pinned here.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import integrator
from raytracingthenextweekcuda_tpu.models.camera import Camera
from raytracingthenextweekcuda_tpu.models.scene import SceneBuilder, finalize
from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
    FRUSTUM_LEAF_THRESHOLD,
    build_worklist,
    use_frustum_worklist,
)


def _random_rays_and_leaves(n=512, L=40, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    lo = rng.uniform(-3, 2.0, (L, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.05, 1.0, (L, 3)).astype(np.float32)
    leaf_bounds = np.concatenate([lo.T, hi.T], axis=0)  # (6, L)
    alive = (rng.random(n) > 0.15).astype(np.int32)
    return o, d, leaf_bounds, alive


def _lists(counts, order):
    counts = np.asarray(counts).ravel()
    order = np.asarray(order)[:, 0, :]
    return [set(order[b, : counts[b]].tolist()) for b in range(len(counts))]


def test_frustum_lists_superset_of_exact():
    o, d, leaf_bounds, alive = _random_rays_and_leaves()
    args = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            jnp.asarray(alive), jnp.asarray(leaf_bounds))
    exact = build_worklist(*args, tmin=1e-3, block=128, frustum=False)
    frus = build_worklist(*args, tmin=1e-3, block=128, frustum=True)
    ex_lists = _lists(exact[0], exact[1])
    fr_lists = _lists(frus[0], frus[1])
    total_ex = total_fr = 0
    for e, f in zip(ex_lists, fr_lists):
        assert e <= f, (sorted(e - f), "frustum list dropped an exact hit")
        total_ex += len(e)
        total_fr += len(f)
    assert total_ex > 0  # the scene actually produced hits
    # Entry distances are ascending per block (front-to-back contract).
    # Replace the +inf padding with a large finite so inf-inf NaNs don't
    # poison the monotonicity diff.
    for arr in (np.asarray(exact[2])[:, 0, :], np.asarray(frus[2])[:, 0, :]):
        arr = np.where(np.isinf(arr), np.float32(3e38), arr)
        assert (np.diff(arr, axis=1) >= -1e-6).all()


def test_frustum_degenerate_direction_interval_is_conservative():
    """Blocks whose direction interval spans zero on an axis must degrade
    to unconstrained, not silently cull (interval arithmetic pitfall)."""
    n, L = 128, 8
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 2.0
    # Directions fan out through +-x so the block's dx interval spans 0.
    phi = np.linspace(-1.2, 1.2, n).astype(np.float32)
    d = np.stack([np.sin(phi), np.zeros(n, np.float32), -np.cos(phi)],
                 axis=1)
    lo = np.asarray([[x, -0.2, -0.6] for x in np.linspace(-3, 2.4, L)],
                    np.float32)
    hi = lo + 0.5
    leaf_bounds = np.concatenate([lo.T, hi.T], axis=0)
    alive = np.ones(n, np.int32)
    args = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            jnp.asarray(alive), jnp.asarray(leaf_bounds))
    exact = build_worklist(*args, tmin=1e-3, block=128, frustum=False)
    frus = build_worklist(*args, tmin=1e-3, block=128, frustum=True)
    (e,) = _lists(exact[0], exact[1])
    (f,) = _lists(frus[0], frus[1])
    assert e <= f


def test_frustum_render_identical_to_exact(monkeypatch):
    """Forcing the frustum builder changes which leaves are WALKED, never
    the image: the kernel's per-ray slab prune makes the extras inert."""
    from raytracingthenextweekcuda_tpu.io.procedural import uv_sphere_mesh

    b = SceneBuilder()
    b.lambertian(0, (0.73, 0.73, 0.73))
    b.metal(1, (0.9, 0.6, 0.2), 0.1)
    b.emission(2, (1.0, 1.0, 1.0), 4.0)
    b.plane((0, -1.05, 0), (0, 1, 0), (5, 0, 5), 2, 0)
    b.sphere((0, 4, 0), 2.0, 2)
    b.mesh(uv_sphere_mesh(0.9, (0, 0, 0), 12, 24), 1)
    scene = finalize(b.build(), use_bvh=True)
    camera = Camera.make(eye=(0, 0.4, 2.6), center=(0, 0, 0), fov=45.0,
                         aperture=0.0, focus_distance=2.6, time1=1.0)
    cfg = RenderConfig(width=32, height=32, spp=2, bounces=4, spp_per_pass=2)

    monkeypatch.setenv("RTNW_WL_FRUSTUM", "0")
    img_exact = np.asarray(
        integrator.render_pass(scene, camera, jax.random.key(5), cfg, 2)
    )
    monkeypatch.setenv("RTNW_WL_FRUSTUM", "1")
    # The env is resolved at TRACE time; clear the jit cache so the second
    # render genuinely re-traces with the frustum builder.
    jax.clear_caches()
    img_frust = np.asarray(
        integrator.render_pass(scene, camera, jax.random.key(5), cfg, 2)
    )
    np.testing.assert_array_equal(img_exact, img_frust)


def test_frustum_threshold_resolution(monkeypatch):
    monkeypatch.delenv("RTNW_WL_FRUSTUM", raising=False)
    assert not use_frustum_worklist(FRUSTUM_LEAF_THRESHOLD)
    assert use_frustum_worklist(FRUSTUM_LEAF_THRESHOLD + 1)
    monkeypatch.setenv("RTNW_WL_FRUSTUM", "1")
    assert use_frustum_worklist(8)
    monkeypatch.setenv("RTNW_WL_FRUSTUM", "0")
    assert not use_frustum_worklist(10**6)
