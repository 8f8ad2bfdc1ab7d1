"""Fused scene-intersection Pallas kernel.

The megakernel's replacement for the hot loop. The pure-XLA batched
intersects (ops/intersect.py) materialize (N, P)-shaped broadcast temps in
HBM — profiling the Cornell trace showed 1.26 GFLOP but 29.7 GB of HBM
traffic, hopelessly memory-bound. This kernel is the TPU-native fix:

* rays are tiled into VMEM blocks of (8, 128) x RAY_TILE_ROWS lanes;
* ALL primitive data (spheres + planes + triangles, padded to 128) sits in
  VMEM for the kernel's lifetime — the analogue of the reference keeping its
  triangle/BVH data in texture cache (main.cu:352-382);
* the (ray x prim) Möller–Trumbore / quadratic / slab math runs tile-by-tile
  entirely in registers/VMEM, reducing to a per-ray closest (t, code) with
  NO HBM intermediates. HBM traffic = read rays once + write (t, code) once.

The kernel returns the winning primitive as a packed int32 code
(type << 24 | index) plus t. It is selection-only and wrapped in
stop_gradient by the caller; the differentiable Hit (t, normal as functions
of scene params) is recomputed outside from the winner's parameters — the
same fixed-topology trick ops/traverse.py uses.

Primitive parity notes:
  spheres  — half-b quadratic, disc > FLT_EPSILON, near-then-far root
             (Sphere.cu:3-78), motion-blur center lerp per ray time;
  planes   — denominator gate two_sided ? |d.n|>eps : d.n>eps, strict
             2-axis extent test by orientation, t in [tmin, tmax)
             (Plane.cu:4-52);
  triangles— Möller–Trumbore with optional backface cull via det sign
             (TriangleMesh.cu:57-80).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingthenextweekcuda_tpu.config import DTYPE, EPSILON, FLT_EPSILON

RAY_BLOCK = 1024          # rays per kernel instance (shaped (8, 128) in VMEM)
PRIM_TILE = 128           # primitives per inner tile (one lane row)
# Plain Python scalars: jnp constants would be captured tracers in pallas.
BIG = 3.0e38
_CODE_MAX = 2**30

TYPE_SPHERE = 1
TYPE_PLANE = 2
TYPE_TRIANGLE = 3


@jax.tree_util.register_pytree_node_class
class PackedScene:
    """Scene primitives packed into kernel-friendly padded planar arrays.

    Every array is (K, pad128) f32 — component-planar, padded with
    never-hit values. `counts` (true S, P, T) is static pytree aux data so
    trace-time `if` tests stay Python bools. Built by `pack_scene`, which is
    pure jnp and jit-safe, so inverse-rendering steps can repack the scene
    from updated parameters on-device every iteration.
    """

    def __init__(self, spheres, planes, triangles, counts, used_kinds=None,
                 shaded=False, bvh_bounds=None, bvh_meta=None,
                 trih=None, quadh=None, hcounts=(0, 0, 0),
                 has_emission=True, leaf_bounds=None, leaf_tiles=None,
                 boxh=None):
        self.spheres = spheres      # (10, Sp): cx0 cy0 cz0 dcx dcy dcz t0 inv_dt r pad
        self.planes = planes        # (13, Pp): pos(3) n(3) lo(3) hi(3) two_sided
        self.triangles = triangles  # (9, Tp): v0(3) e1(3) e2(3)
        self.counts = counts        # static (S, P, T)
        # Static set of material kinds present in the scene; the BSDF
        # compiles only these branches (None = all kinds).
        self.used_kinds = used_kinds
        # True when each type array carries the 8 material-attribute rows
        # appended by bounce_kernel.pack_scene_shaded (the fused-bounce
        # megastep needs them; this kernel ignores the extra rows).
        self.shaded = shaded
        # Tile-BVH node arrays for the megastep's block-consensus traversal
        # (ops/bvh_tile.py): (6, M) f32 bounds + (3, M) i32 meta, or None.
        # Triangle columns are then in leaf-tile order.
        self.bvh_bounds = bvh_bounds
        self.bvh_meta = bvh_meta
        # Havel-packed brute-mesh geometry for the bounce megastep ONLY
        # (bounce_kernel.pack_scene_shaded): precomputed plane + edge-plane
        # rows, with coplanar triangle pairs merged into parallelogram quads
        # (the reference's own ladder precomputes per-triangle planes too,
        # Loader.cpp:189-201 / Geometry.h:53-55). This kernel and the
        # differentiable path keep using `triangles` (v0/e1/e2 in original
        # triangle order) — winner codes stay stable.
        self.trih = trih            # (20, Tp'): n̂(3) dc e1p(3) d1 e2p(3) d2 + mat(8)
        self.quadh = quadh          # (20, Qp): same rows, uv in [0,1]²
        # Closed 6-quad groups further merged into oriented boxes (OBB slab
        # test in the megastep — bounce_kernel._merge_boxes).
        self.boxh = boxh            # (23, Bp): c(3) u(3) v(3) w(3) h(3) + mat(8)
        self.hcounts = hcounts      # static (T', Q, B)
        # Static: any material has nonzero Path-B additive emission
        # (CUDAPathTracer.cu:430). When False the megastep skips the three
        # emission winner-rows and their radiance FMAs entirely.
        self.has_emission = has_emission
        # Leaf-only tile-BVH views for the work-list winner kernel
        # (ops/pallas/bvh_winner_kernel.py): (6, L) f32 leaf AABBs and
        # (1, L) i32 leaf tile starts (triangle column offsets into trih).
        self.leaf_bounds = leaf_bounds
        self.leaf_tiles = leaf_tiles

    def tree_flatten(self):
        return (
            (self.spheres, self.planes, self.triangles,
             self.bvh_bounds, self.bvh_meta, self.trih, self.quadh,
             self.leaf_bounds, self.leaf_tiles, self.boxh),
            (self.counts, self.used_kinds, self.shaded, self.hcounts,
             self.has_emission),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        counts, used_kinds, shaded, hcounts, has_emission = aux
        (spheres, planes, triangles, bvh_bounds, bvh_meta,
         trih, quadh, leaf_bounds, leaf_tiles, boxh) = children
        return cls(spheres, planes, triangles, counts, used_kinds, shaded,
                   bvh_bounds, bvh_meta, trih, quadh, hcounts, has_emission,
                   leaf_bounds, leaf_tiles, boxh)


def _pad128(n: int) -> int:
    return max(128, ((n + 127) // 128) * 128)


def pack_scene(scene, include_triangles: bool = True) -> PackedScene:
    """Pack Scene primitive SoA into planar padded arrays (jnp, jit-safe).

    Values are stop-gradient'd: the kernel output is selection-only.
    `include_triangles=False` packs only spheres+planes — used when a BVH
    handles the triangles and the fused kernel covers the analytic
    primitives (two-level dispatch).
    """
    sg = jax.lax.stop_gradient

    sph = scene.spheres
    S = sph.count
    sp = jnp.zeros((10, _pad128(S)), DTYPE)
    if S:
        c0 = sg(sph.center0)
        dc = sg(sph.center1) - c0
        sp = sp.at[0:3, :S].set(c0.T)
        sp = sp.at[3:6, :S].set(dc.T)
        sp = sp.at[6, :S].set(sg(sph.time0))
        sp = sp.at[7, :S].set(1.0 / (sg(sph.time1) - sg(sph.time0)))
        sp = sp.at[8, :S].set(sg(sph.radius))
    # radius 0 in padding -> disc test never passes.

    pla = scene.planes
    P = pla.count
    pp = jnp.zeros((13, _pad128(P)), DTYPE)
    if P:
        pos = sg(pla.position)
        ext = sg(pla.extend)
        lo = pos - ext
        hi = pos + ext
        # The finite-extent test only checks the two axes named by the
        # orientation (Plane.cu:24-46); open the third axis' interval.
        # XY -> z free, YZ -> x free, XZ -> y free.
        open_axis = jnp.asarray([2, 0, 1], jnp.int32)[pla.orientation]  # (P,)
        axis_ids = jnp.arange(3)[None, :]
        is_open = axis_ids == open_axis[:, None]
        lo = jnp.where(is_open, -3e38, lo)
        hi = jnp.where(is_open, 3e38, hi)
        pp = pp.at[0:3, :P].set(pos.T)
        pp = pp.at[3:6, :P].set(sg(pla.normal).T)
        pp = pp.at[6:9, :P].set(lo.T)
        pp = pp.at[9:12, :P].set(hi.T)
        pp = pp.at[12, :P].set(pla.two_sided.astype(DTYPE))
    # padding: normal 0 -> denominator 0 -> gate fails.

    tri = scene.triangles
    T = tri.count if include_triangles else 0
    tp = jnp.zeros((9, _pad128(T)), DTYPE)
    if T:
        v = sg(tri.vertices)
        tp = tp.at[0:3, :T].set(v[:, 0].T)
        tp = tp.at[3:6, :T].set((v[:, 1] - v[:, 0]).T)
        tp = tp.at[6:9, :T].set((v[:, 2] - v[:, 0]).T)
    # padding: e1=e2=0 -> det 0 -> culled.

    # Static material-kind set (requires concrete kinds, i.e. pack outside
    # of or before any trace that abstracts them; fall back to None inside
    # a trace where values are unavailable).
    has_emission = True
    try:
        used_kinds = tuple(sorted({int(k) for k in np.asarray(scene.materials.kind)}))
        has_emission = bool(np.any(np.asarray(scene.materials.emission)))
    except (jax.errors.TracerArrayConversionError, TypeError):
        used_kinds = None

    return PackedScene(sp, pp, tp, (S, P, T), used_kinds,
                       has_emission=has_emission)


def pack_scene_host(scene, include_triangles: bool = True,
                    to_jnp: bool = True) -> PackedScene:
    """Pure-numpy pack_scene for CONCRETE scenes (finalize-time fast path).

    Bit-identical arrays to pack_scene (tests/test_intersect.py asserts),
    but zero XLA dispatches: the eager jnp `.at[].set` chain in pack_scene
    compiles ~70 one-off programs per scene (~25 s on CPU, ~90 s through
    the axon TPU relay) — unacceptable per finalize. jnp pack_scene remains
    the jit-safe path for on-device repacking inside fit steps.

    Raises jax.errors.TracerArrayConversionError on abstract scenes;
    callers fall back to pack_scene.
    """
    g = jax.device_get
    npf = np.float32

    sph = scene.spheres
    S = sph.count
    sp = np.zeros((10, _pad128(S)), npf)
    if S:
        c0 = np.asarray(g(sph.center0), npf)
        dc = np.asarray(g(sph.center1), npf) - c0
        t0 = np.asarray(g(sph.time0), npf)
        t1 = np.asarray(g(sph.time1), npf)
        sp[0:3, :S] = c0.T
        sp[3:6, :S] = dc.T
        sp[6, :S] = t0
        sp[7, :S] = npf(1.0) / (t1 - t0)
        sp[8, :S] = np.asarray(g(sph.radius), npf)

    pla = scene.planes
    P = pla.count
    pp = np.zeros((13, _pad128(P)), npf)
    if P:
        pos = np.asarray(g(pla.position), npf)
        ext = np.asarray(g(pla.extend), npf)
        lo = pos - ext
        hi = pos + ext
        orient = np.asarray(g(pla.orientation))
        open_axis = np.asarray([2, 0, 1], np.int32)[orient]
        is_open = np.arange(3)[None, :] == open_axis[:, None]
        lo = np.where(is_open, npf(-3e38), lo)
        hi = np.where(is_open, npf(3e38), hi)
        pp[0:3, :P] = pos.T
        pp[3:6, :P] = np.asarray(g(pla.normal), npf).T
        pp[6:9, :P] = lo.T
        pp[9:12, :P] = hi.T
        pp[12, :P] = np.asarray(g(pla.two_sided)).astype(npf)

    tri = scene.triangles
    T = tri.count if include_triangles else 0
    tp = np.zeros((9, _pad128(T)), npf)
    if T:
        v = np.asarray(g(tri.vertices), npf)
        tp[0:3, :T] = v[:, 0].T
        tp[3:6, :T] = (v[:, 1] - v[:, 0]).T
        tp[6:9, :T] = (v[:, 2] - v[:, 0]).T

    kinds = np.asarray(g(scene.materials.kind))
    used_kinds = tuple(sorted({int(k) for k in kinds}))
    has_emission = bool(np.any(np.asarray(g(scene.materials.emission))))

    conv = jnp.asarray if to_jnp else (lambda a: a)
    return PackedScene(
        conv(sp), conv(pp), conv(tp), (S, P, T),
        used_kinds, has_emission=has_emission,
    )


def _intersect_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref, alive_ref,
    sph_ref, pla_ref, tri_ref,
    t_ref, code_ref,
    *, n_sph_tiles: int, n_pla_tiles: int, n_tri_tiles: int,
    tmin: float, backface_cull: bool,
):
    # Ray block refs are (1, ROWS, 128); drop the leading block axis.
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tm = tm_ref[0]
    shape = ox.shape  # (ROWS, 128)
    any_alive = jnp.any(alive_ref[0] != 0)  # block-level dead-ray skip

    best_t = jnp.full(shape, BIG, jnp.float32)
    best_code = jnp.full(shape, -1, jnp.int32)

    o1 = lambda a: a[..., None]          # (ROWS, 128) -> (ROWS, 128, 1)
    # Primitive tiles broadcast on a trailing axis of PRIM_TILE.

    def prim_row(ref, row, j):
        return ref[row, pl.ds(j * PRIM_TILE, PRIM_TILE)][None, None, :]

    def consider(valid, t, code, best_t, best_code):
        # Reduce (ROWS, 128, PRIM_TILE) candidates over the prim axis with
        # min-reductions only (no gathers — TPU-hostile inside kernels).
        t_masked = jnp.where(valid, t, BIG)
        tile_best = jnp.min(t_masked, axis=-1)
        improved = tile_best < best_t
        is_best = valid & (t_masked <= o1(tile_best))
        win_code = jnp.min(jnp.where(is_best, code, _CODE_MAX), axis=-1)
        return (
            jnp.where(improved, tile_best, best_t),
            jnp.where(improved, win_code, best_code),
        )

    # ---- spheres ----
    def sphere_tile(j, carry):
        best_t, best_code = carry
        cx = prim_row(sph_ref, 0, j) + prim_row(sph_ref, 3, j) * (
            (o1(tm) - prim_row(sph_ref, 6, j)) * prim_row(sph_ref, 7, j)
        )
        cy = prim_row(sph_ref, 1, j) + prim_row(sph_ref, 4, j) * (
            (o1(tm) - prim_row(sph_ref, 6, j)) * prim_row(sph_ref, 7, j)
        )
        cz = prim_row(sph_ref, 2, j) + prim_row(sph_ref, 5, j) * (
            (o1(tm) - prim_row(sph_ref, 6, j)) * prim_row(sph_ref, 7, j)
        )
        r = prim_row(sph_ref, 8, j)
        ocx, ocy, ocz = o1(ox) - cx, o1(oy) - cy, o1(oz) - cz
        a = o1(dx * dx + dy * dy + dz * dz)
        half_b = ocx * o1(dx) + ocy * o1(dy) + ocz * o1(dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - a * c
        ok = disc > FLT_EPSILON
        sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
        inv_a = 1.0 / a
        r0 = (-half_b - sq) * inv_a
        r1 = (-half_b + sq) * inv_a
        in0 = (r0 >= tmin) & (r0 <= o1(best_t))
        in1 = (r1 >= tmin) & (r1 <= o1(best_t))
        t = jnp.where(in0, r0, r1)
        valid = ok & (in0 | in1)
        idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 2) + j * PRIM_TILE
        code = (TYPE_SPHERE << 24) | idx
        return consider(valid, t, code, best_t, best_code)

    # ---- planes ----
    def plane_tile(j, carry):
        best_t, best_code = carry
        nx, ny, nz = (prim_row(pla_ref, 3, j), prim_row(pla_ref, 4, j),
                      prim_row(pla_ref, 5, j))
        denom = o1(dx) * nx + o1(dy) * ny + o1(dz) * nz
        two_sided = prim_row(pla_ref, 12, j) > 0.5
        # Boolean algebra, not select_n: Mosaic rejects select on i1 vectors.
        gate = (two_sided & (jnp.abs(denom) > EPSILON)) | (
            ~two_sided & (denom > EPSILON)
        )
        inv_den = 1.0 / jnp.where(gate, denom, 1.0)
        pox = prim_row(pla_ref, 0, j) - o1(ox)
        poy = prim_row(pla_ref, 1, j) - o1(oy)
        poz = prim_row(pla_ref, 2, j) - o1(oz)
        t = (pox * nx + poy * ny + poz * nz) * inv_den
        hx = o1(ox) + t * o1(dx)
        hy = o1(oy) + t * o1(dy)
        hz = o1(oz) + t * o1(dz)
        inside = (
            (hx > prim_row(pla_ref, 6, j)) & (hx < prim_row(pla_ref, 9, j))
            & (hy > prim_row(pla_ref, 7, j)) & (hy < prim_row(pla_ref, 10, j))
            & (hz > prim_row(pla_ref, 8, j)) & (hz < prim_row(pla_ref, 11, j))
        )
        valid = gate & inside & (t >= tmin) & (t < o1(best_t))
        idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 2) + j * PRIM_TILE
        code = (TYPE_PLANE << 24) | idx
        return consider(valid, t, code, best_t, best_code)

    # ---- triangles ----
    def tri_tile(j, carry):
        best_t, best_code = carry
        e1x, e1y, e1z = (prim_row(tri_ref, 3, j), prim_row(tri_ref, 4, j),
                         prim_row(tri_ref, 5, j))
        e2x, e2y, e2z = (prim_row(tri_ref, 6, j), prim_row(tri_ref, 7, j),
                         prim_row(tri_ref, 8, j))
        px = o1(dy) * e2z - o1(dz) * e2y
        py = o1(dz) * e2x - o1(dx) * e2z
        pz = o1(dx) * e2y - o1(dy) * e2x
        det = e1x * px + e1y * py + e1z * pz
        if backface_cull:
            ok = det > FLT_EPSILON
        else:
            ok = jnp.abs(det) > FLT_EPSILON
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx = o1(ox) - prim_row(tri_ref, 0, j)
        ty = o1(oy) - prim_row(tri_ref, 1, j)
        tz = o1(oz) - prim_row(tri_ref, 2, j)
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (o1(dx) * qx + o1(dy) * qy + o1(dz) * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        valid = (
            ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > tmin) & (t < o1(best_t))
        )
        idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 2) + j * PRIM_TILE
        code = (TYPE_TRIANGLE << 24) | idx
        return consider(valid, t, code, best_t, best_code)

    t_ref[0] = jnp.full(shape, BIG, jnp.float32)
    code_ref[0] = jnp.full(shape, -1, jnp.int32)

    @pl.when(any_alive)
    def _():
        carry = (best_t, best_code)
        carry = jax.lax.fori_loop(0, n_sph_tiles, sphere_tile, carry)
        carry = jax.lax.fori_loop(0, n_pla_tiles, plane_tile, carry)
        carry = jax.lax.fori_loop(0, n_tri_tiles, tri_tile, carry)
        bt, bc = carry
        t_ref[0] = jnp.where(bc >= 0, bt, BIG)
        code_ref[0] = bc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _run_kernel_nodiff(ray_comps, packed_arrays, counts, tmin, backface_cull, interpret):
    """Selection kernel with an explicit zero-gradient rule.

    pallas_call has no autodiff rule; this op is pure discrete selection
    (winner index + its non-differentiable t), so its VJP is exactly zero —
    the differentiable t/normal are recomputed outside (ops/fused.py).
    """
    return _run_kernel(ray_comps, packed_arrays, counts, tmin, backface_cull, interpret)


def _run_kernel_fwd(ray_comps, packed_arrays, counts, tmin, backface_cull, interpret):
    out = _run_kernel(ray_comps, packed_arrays, counts, tmin, backface_cull, interpret)
    return out, (ray_comps, packed_arrays)


def _run_kernel_bwd(counts, tmin, backface_cull, interpret, residuals, _ct):
    ray_comps, packed_arrays = residuals
    return (
        tuple(jnp.zeros_like(a) for a in ray_comps),
        tuple(jnp.zeros_like(a) for a in packed_arrays),
    )


_run_kernel_nodiff.defvjp(_run_kernel_fwd, _run_kernel_bwd)


def _intersect_kernel_scalar(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref, alive_ref,
    sph_ref, pla_ref, tri_ref,
    t_ref, code_ref,
    *, n_sph: int, n_pla: int, n_tri: int, tmin: float, backface_cull: bool,
):
    """Scalar-primitive variant for small scenes.

    One primitive per inner step, its parameters read as scalars and
    broadcast into (ROWS, 128) ray-block vector ops — zero padding waste
    (the lane-tiled kernel pads every type to 128 columns, a 12x overhead
    for the 32-primitive Cornell box; profiling showed that kernel at 84%
    of the render pass). Work scales with the TRUE primitive count.
    """
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tm = tm_ref[0]
    shape = ox.shape

    # Wavefront compaction, block granularity: terminated rays cluster
    # spatially (sky/light regions), so whole ray blocks go all-dead on
    # later bounces and skip every primitive loop. The megakernel analogue
    # is each CUDA thread's early return (main.cu:80,89) — here it's
    # amortized per 1024-ray block instead of per lane.
    any_alive = jnp.any(alive_ref[0] != 0)

    t_ref[0] = jnp.full(shape, BIG, jnp.float32)
    code_ref[0] = jnp.full(shape, -1, jnp.int32)

    def consider(valid, t, code_scalar, best_t, best_code):
        win = valid & (t < best_t)
        return (
            jnp.where(win, t, best_t),
            jnp.where(win, code_scalar, best_code),
        )

    def sphere_body(i, carry):
        best_t, best_code = carry
        w = (tm - sph_ref[6, i]) * sph_ref[7, i]
        cx = sph_ref[0, i] + sph_ref[3, i] * w
        cy = sph_ref[1, i] + sph_ref[4, i] * w
        cz = sph_ref[2, i] + sph_ref[5, i] * w
        r = sph_ref[8, i]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        a = dx * dx + dy * dy + dz * dz
        half_b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - a * c
        ok = disc > FLT_EPSILON
        sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
        inv_a = 1.0 / a
        r0 = (-half_b - sq) * inv_a
        r1 = (-half_b + sq) * inv_a
        in0 = (r0 >= tmin) & (r0 <= best_t)
        in1 = (r1 >= tmin) & (r1 <= best_t)
        t = jnp.where(in0, r0, r1)
        return consider(ok & (in0 | in1), t, (TYPE_SPHERE << 24) | i, best_t, best_code)

    def plane_body(i, carry):
        best_t, best_code = carry
        nx, ny, nz = pla_ref[3, i], pla_ref[4, i], pla_ref[5, i]
        denom = dx * nx + dy * ny + dz * nz
        two_sided = pla_ref[12, i] > 0.5  # scalar, broadcasts into the gates
        gate_two = jnp.abs(denom) > EPSILON
        gate_one = denom > EPSILON
        gate = (gate_two & two_sided) | (gate_one & jnp.logical_not(two_sided))
        inv_den = 1.0 / jnp.where(gate, denom, 1.0)
        t = ((pla_ref[0, i] - ox) * nx + (pla_ref[1, i] - oy) * ny
             + (pla_ref[2, i] - oz) * nz) * inv_den
        hx = ox + t * dx
        hy = oy + t * dy
        hz = oz + t * dz
        inside = (
            (hx > pla_ref[6, i]) & (hx < pla_ref[9, i])
            & (hy > pla_ref[7, i]) & (hy < pla_ref[10, i])
            & (hz > pla_ref[8, i]) & (hz < pla_ref[11, i])
        )
        valid = gate & inside & (t >= tmin) & (t < best_t)
        return consider(valid, t, (TYPE_PLANE << 24) | i, best_t, best_code)

    def tri_body(i, carry):
        best_t, best_code = carry
        e1x, e1y, e1z = tri_ref[3, i], tri_ref[4, i], tri_ref[5, i]
        e2x, e2y, e2z = tri_ref[6, i], tri_ref[7, i], tri_ref[8, i]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        if backface_cull:
            ok = det > FLT_EPSILON
        else:
            ok = jnp.abs(det) > FLT_EPSILON
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx = ox - tri_ref[0, i]
        ty = oy - tri_ref[1, i]
        tz = oz - tri_ref[2, i]
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        valid = (
            ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > tmin) & (t < best_t)
        )
        return consider(valid, t, (TYPE_TRIANGLE << 24) | i, best_t, best_code)

    @pl.when(any_alive)
    def _():
        carry = (
            jnp.full(shape, BIG, jnp.float32),
            jnp.full(shape, -1, jnp.int32),
        )
        if n_sph:
            carry = jax.lax.fori_loop(0, n_sph, sphere_body, carry)
        if n_pla:
            carry = jax.lax.fori_loop(0, n_pla, plane_body, carry)
        if n_tri:
            carry = jax.lax.fori_loop(0, n_tri, tri_body, carry)
        best_t, best_code = carry
        t_ref[0] = jnp.where(best_code >= 0, best_t, BIG)
        code_ref[0] = best_code


# Below this primitive count the scalar-prim kernel (zero padding waste)
# wins; above it the lane-tiled kernel amortizes better.
SCALAR_KERNEL_MAX_PRIMS = 2048


@functools.partial(
    jax.jit, static_argnames=("counts", "tmin", "backface_cull", "interpret")
)
def _run_kernel(ray_comps, packed_arrays, counts, tmin, backface_cull, interpret):
    ox, oy, oz, dx, dy, dz, tm, alive = ray_comps
    sph, pla, tri = packed_arrays
    n = ox.shape[0]
    n_blocks = n // RAY_BLOCK
    rows = RAY_BLOCK // 128

    def reshape(a):
        return a.reshape(n_blocks, rows, 128)

    scalar_variant = sum(counts) <= SCALAR_KERNEL_MAX_PRIMS
    if scalar_variant:
        kern = functools.partial(
            _intersect_kernel_scalar,
            n_sph=counts[0], n_pla=counts[1], n_tri=counts[2],
            tmin=tmin, backface_cull=backface_cull,
        )
    else:
        kern = functools.partial(
            _intersect_kernel,
            n_sph_tiles=sph.shape[1] // PRIM_TILE if counts[0] else 0,
            n_pla_tiles=pla.shape[1] // PRIM_TILE if counts[1] else 0,
            n_tri_tiles=tri.shape[1] // PRIM_TILE if counts[2] else 0,
            tmin=tmin,
            backface_cull=backface_cull,
        )
    ray_spec = pl.BlockSpec(
        (1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # Scalar-prim kernel reads primitives one scalar at a time with dynamic
    # indices -> SMEM; the lane-tiled kernel streams 128-wide tiles -> VMEM.
    prim_spec = pl.BlockSpec(
        memory_space=pltpu.SMEM if scalar_variant else pltpu.VMEM
    )
    out_t, out_code = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[ray_spec] * 8 + [prim_spec] * 3,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, rows, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        reshape(ox), reshape(oy), reshape(oz),
        reshape(dx), reshape(dy), reshape(dz), reshape(tm), reshape(alive),
        sph, pla, tri,
    )
    return out_t.reshape(n), out_code.reshape(n)


def intersect_packed(rays, packed: PackedScene, tmin=EPSILON,
                     backface_cull: bool = True, interpret: bool = False,
                     alive=None, include_triangles: bool = True):
    """Closest-hit over the packed scene. Returns (t, code) per ray;
    code < 0 on miss, else type << 24 | prim index. Selection only — wrap
    in stop_gradient and recompute shading differentiably outside.

    `alive` (bool (N,), optional) enables block-granular dead-ray skipping:
    a 1024-ray block whose rays are all terminated skips every primitive
    loop. Pads the ray count up to a RAY_BLOCK multiple internally.

    `include_triangles=False` covers only spheres+planes — used when the
    tile-BVH winner kernel (ops/pallas/bvh_winner_kernel.py) handles the
    mesh and this kernel the analytic primitives (two-level dispatch).
    """
    n = rays.origin.shape[0]
    n_pad = ((n + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK

    def pad(a):
        return jnp.pad(a, (0, n_pad - n)) if n_pad != n else a

    if alive is None:
        alive_i = jnp.ones((n,), jnp.int32)
    else:
        alive_i = alive.astype(jnp.int32)
    comps = (
        pad(rays.origin[:, 0]), pad(rays.origin[:, 1]), pad(rays.origin[:, 2]),
        pad(rays.direction[:, 0] + 0.0), pad(rays.direction[:, 1]),
        pad(rays.direction[:, 2]), pad(rays.time), pad(alive_i),
    )
    tri = packed.triangles
    counts = packed.counts
    if not include_triangles:
        tri = tri[:, :1]
        counts = (counts[0], counts[1], 0)
    t, code = _run_kernel_nodiff(
        comps,
        (packed.spheres, packed.planes, tri),
        counts, float(tmin), bool(backface_cull), bool(interpret),
    )
    return t[:n], code[:n]
