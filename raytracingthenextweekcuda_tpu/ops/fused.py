"""Fused scene intersection: Pallas kernel winner + differentiable recompute.

The kernel (ops/pallas/intersect_kernel.py) returns only the winning
primitive code and a non-differentiable t. This module rebuilds the full
Hit record from the winner's actual scene parameters — one small gather per
ray, then the exact per-type math — so t and normal carry gradients wrt
sphere centers/radii, plane positions and triangle vertices while the
discrete winner selection stays fixed (the stop-gradient-the-selection rule,
same as ops/traverse.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracingthenextweekcuda_tpu.config import FLT_EPSILON
from raytracingthenextweekcuda_tpu.ops import linalg
from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
    TYPE_PLANE,
    TYPE_SPHERE,
    TYPE_TRIANGLE,
    PackedScene,
    intersect_packed,
    pack_scene,
)
from raytracingthenextweekcuda_tpu.ops.rays import Hit, Rays, face_normal


def intersect_scene_fused(
    scene, packed: PackedScene, rays: Rays, tmin, backface_cull: bool = True,
    interpret: bool = False,
) -> Hit:
    t_sel, code = jax.lax.stop_gradient(
        intersect_packed(rays, packed, tmin, backface_cull, interpret)
    )
    valid = code >= 0
    ptype = jnp.where(valid, code >> 24, 0)
    idx = jnp.where(valid, code & 0xFFFFFF, 0)

    n = rays.count
    dtype = rays.origin.dtype
    t = jnp.full((n,), jnp.inf, dtype)
    outward = jnp.zeros((n, 3), dtype)
    material_id = jnp.full((n,), -1, jnp.int32)

    # --- sphere winners: recompute the selected root differentiably ---
    if scene.spheres.count:
        s_idx = jnp.clip(idx, 0, scene.spheres.count - 1)
        c0 = scene.spheres.center0[s_idx]
        c1 = scene.spheres.center1[s_idx]
        w = (rays.time - scene.spheres.time0[s_idx]) / (
            scene.spheres.time1[s_idx] - scene.spheres.time0[s_idx]
        )
        center = c0 + w[:, None] * (c1 - c0)
        radius = scene.spheres.radius[s_idx]
        oc = rays.origin - center
        a = linalg.length_squared(rays.direction)
        half_b = linalg.dot(oc, rays.direction)
        c = linalg.length_squared(oc) - radius * radius
        disc = jnp.maximum(half_b * half_b - a * c, 0.0)
        sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0)) * jnp.where(disc > 0, 1.0, 0.0)
        r0 = (-half_b - sq) / a
        r1 = (-half_b + sq) / a
        # The kernel already decided which root won; pick the one matching.
        pick0 = jnp.abs(r0 - t_sel) <= jnp.abs(r1 - t_sel)
        t_sph = jnp.where(pick0, r0, r1)
        n_sph = (rays.at(t_sph) - center) / radius[:, None]
        is_sph = valid & (ptype == TYPE_SPHERE)
        t = jnp.where(is_sph, t_sph, t)
        outward = jnp.where(is_sph[:, None], n_sph, outward)
        material_id = jnp.where(
            is_sph, scene.spheres.material_id[s_idx], material_id
        ).astype(jnp.int32)

    # --- plane winners ---
    if scene.planes.count:
        p_idx = jnp.clip(idx, 0, scene.planes.count - 1)
        normal = scene.planes.normal[p_idx]
        denom = linalg.dot(normal, rays.direction)
        denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        po = scene.planes.position[p_idx] - rays.origin
        t_pla = linalg.dot(po, normal) / denom
        is_pla = valid & (ptype == TYPE_PLANE)
        t = jnp.where(is_pla, t_pla, t)
        outward = jnp.where(is_pla[:, None], normal, outward)
        material_id = jnp.where(
            is_pla, scene.planes.material_id[p_idx], material_id
        ).astype(jnp.int32)

    # --- triangle winners ---
    if scene.triangles.count:
        t_idx = jnp.clip(idx, 0, scene.triangles.count - 1)
        tv = scene.triangles.vertices[t_idx]
        v0, e1, e2 = tv[:, 0], tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]
        pvec = linalg.cross(rays.direction, e2)
        det = linalg.dot(e1, pvec)
        inv_det = 1.0 / jnp.where(jnp.abs(det) > FLT_EPSILON, det, 1.0)
        qvec = linalg.cross(rays.origin - v0, e1)
        t_tri = linalg.dot(e2, qvec) * inv_det
        n_tri = linalg.normalize(linalg.cross(e1, e2))
        is_tri = valid & (ptype == TYPE_TRIANGLE)
        t = jnp.where(is_tri, t_tri, t)
        outward = jnp.where(is_tri[:, None], n_tri, outward)
        material_id = jnp.where(
            is_tri, scene.triangles.material_id[t_idx], material_id
        ).astype(jnp.int32)

    front, normal = face_normal(rays.direction, outward)
    return Hit(
        t=t,
        normal=jnp.where(valid[:, None], normal, 0.0),
        front_face=front & valid,
        material_id=material_id,
        valid=valid,
    )


__all__ = ["intersect_scene_fused", "pack_scene", "PackedScene"]
