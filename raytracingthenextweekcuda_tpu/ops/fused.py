"""Fused scene intersection: Pallas kernel winner + differentiable recompute.

The kernel (ops/pallas/intersect_kernel.py) returns only the winning
primitive code and a non-differentiable t. This module rebuilds the full
Hit record from the winner's actual scene parameters, so t and normal carry
gradients wrt sphere centers/radii, plane positions and triangle vertices
while the discrete winner selection stays fixed (the
stop-gradient-the-selection rule, same as ops/traverse.py).

Winner parameter lookup uses one-hot matmuls (linalg.take_rows), not
gathers: XLA lowers (N,)-row gathers to scalar loops on TPU (profiled at
12.6 GB of HBM traffic for a Cornell-sized table), while one_hot @ table
rides the MXU and its transpose is exactly the scatter-add the backward
pass needs.
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
    interpret: bool = False, alive=None,
) -> Hit:
    import os

    has_tile_bvh = getattr(packed, "leaf_bounds", None) is not None
    # Profiling ablation ONLY (wrong image): skip the winner-kernel mesh
    # branch to time the rest of the sorted bounce (sort+analytic+shade).
    # Triangles stay OUT of the analytic kernel either way.
    skip_mesh = os.environ.get("RTNW_DEBUG_SKIP_MESH") == "1"
    if skip_mesh:
        import warnings

        warnings.warn(
            "RTNW_DEBUG_SKIP_MESH=1: profiling ablation active — the "
            "rendered image is WRONG (mesh intersection skipped). The flag "
            "is baked into the jit cache at trace time; unsetting it later "
            "in this process has no effect on already-traced functions.",
            stacklevel=2,
        )
    t_sel, code = jax.lax.stop_gradient(
        intersect_packed(rays, packed, tmin, backface_cull, interpret,
                         alive=alive, include_triangles=not has_tile_bvh)
    )
    if has_tile_bvh and not skip_mesh:
        # Two-level dispatch: the work-list winner kernel covers the mesh
        # (ops/pallas/bvh_winner_kernel.py), intersect_packed the analytic
        # primitives; merge by closest t. Triangle codes index the permuted
        # padded triangle rows, which is exactly scene.triangles' order
        # after models.scene.finalize — the recompute below needs no remap.
        from raytracingthenextweekcuda_tpu.ops.pallas.bvh_winner_kernel import (
            intersect_packed_bvh,
        )

        # Mesh-needed masking: a ray whose slab test misses the mesh ROOT
        # box, or whose closest ANALYTIC hit lies in front of the root
        # entry, cannot produce a mesh winner — mark it dead for the
        # winner kernel so its block's work list shrinks (and fully
        # mesh-dead blocks skip entirely). The analogue of the
        # reference's mesh-level AABB early-out (TriangleMesh.cu:35-37),
        # lifted to the wavefront.
        sg = jax.lax.stop_gradient
        o = sg(rays.origin)
        d = sg(rays.direction)
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
        root_hit = (rtf >= rtn) & (rtf >= tmin)
        unoccluded = (code < 0) | (rtn <= t_sel)
        alive_mesh = root_hit & unoccluded
        if alive is not None:
            alive_mesh = alive_mesh & alive

        from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
            BIG,
        )

        # Per-ray analytic occlusion ceiling: the winner kernel searches
        # only in FRONT of the closest analytic hit (a triangle behind the
        # wall this ray already hit can never win the closest-t merge
        # below), which prunes leaf visits per ray and tightens the
        # kernel's block occlusion horizon.
        t_cap = jnp.where(code >= 0, t_sel, BIG)
        t_m, c_m = jax.lax.stop_gradient(
            intersect_packed_bvh(rays, packed, tmin, backface_cull,
                                 interpret, alive=alive_mesh, t_cap=t_cap)
        )
        pick_mesh = (c_m >= 0) & ((t_m < t_sel) | (code < 0))
        t_sel = jnp.where(pick_mesh, t_m, t_sel)
        code = jnp.where(pick_mesh, c_m, code)
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
        sph = scene.spheres
        s_idx = jnp.where(ptype == TYPE_SPHERE, idx, 0)
        # (S, 11) winner table: c0, c1, time0, time1, radius, material_id.
        table = jnp.concatenate(
            [
                sph.center0, sph.center1,
                sph.time0[:, None], sph.time1[:, None],
                sph.radius[:, None],
                sph.material_id.astype(dtype)[:, None],
            ],
            axis=1,
        )
        row = linalg.take_rows(table, s_idx)
        c0, c1 = row[:, 0:3], row[:, 3:6]
        t0, t1, radius = row[:, 6], row[:, 7], row[:, 8]
        w = (rays.time - t0) / (t1 - t0)
        center = c0 + w[:, None] * (c1 - c0)
        oc = rays.origin - center
        a = linalg.length_squared(rays.direction)
        half_b = linalg.dot(oc, rays.direction)
        c = linalg.length_squared(oc) - radius * radius
        disc = jnp.maximum(half_b * half_b - a * c, 0.0)
        sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0)) * (disc > 0)
        r0 = (-half_b - sq) / a
        r1 = (-half_b + sq) / a
        # The kernel already decided which root won; pick the matching one.
        pick0 = jnp.abs(r0 - t_sel) <= jnp.abs(r1 - t_sel)
        t_sph = jnp.where(pick0, r0, r1)
        n_sph = (rays.at(t_sph) - center) / radius[:, None]
        is_sph = valid & (ptype == TYPE_SPHERE)
        t = jnp.where(is_sph, t_sph, t)
        outward = jnp.where(is_sph[:, None], n_sph, outward)
        material_id = jnp.where(
            is_sph, jnp.round(row[:, 9]).astype(jnp.int32), material_id
        )

    # --- plane winners ---
    if scene.planes.count:
        pla = scene.planes
        p_idx = jnp.where(ptype == TYPE_PLANE, idx, 0)
        table = jnp.concatenate(
            [pla.position, pla.normal, pla.material_id.astype(dtype)[:, None]],
            axis=1,
        )
        row = linalg.take_rows(table, p_idx)
        position, normal = row[:, 0:3], row[:, 3:6]
        denom = linalg.dot(normal, rays.direction)
        denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        t_pla = linalg.dot(position - rays.origin, normal) / denom
        is_pla = valid & (ptype == TYPE_PLANE)
        t = jnp.where(is_pla, t_pla, t)
        outward = jnp.where(is_pla[:, None], normal, outward)
        material_id = jnp.where(
            is_pla, jnp.round(row[:, 6]).astype(jnp.int32), material_id
        )

    # --- triangle winners ---
    if scene.triangles.count:
        tri = scene.triangles
        t_idx = jnp.where(ptype == TYPE_TRIANGLE, idx, 0)
        T = tri.count
        table = jnp.concatenate(
            [tri.vertices.reshape(T, 9), tri.material_id.astype(dtype)[:, None]],
            axis=1,
        )
        row = linalg.take_rows(table, t_idx)
        v0 = row[:, 0:3]
        e1 = row[:, 3:6] - v0
        e2 = row[:, 6:9] - v0
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
            is_tri, jnp.round(row[:, 9]).astype(jnp.int32), material_id
        )

    front, normal = face_normal(rays.direction, outward)
    return Hit(
        t=t,
        normal=jnp.where(valid[:, None], normal, 0.0),
        front_face=front & valid,
        material_id=material_id,
        valid=valid,
    )


__all__ = ["intersect_scene_fused", "pack_scene", "PackedScene"]
