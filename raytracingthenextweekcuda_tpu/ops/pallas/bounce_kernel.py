"""Fused bounce megastep: intersect + shade + scatter in ONE Pallas kernel.

The forward-only production render path. The wavefront integrator
(models/integrator.py) runs each bounce as a chain of XLA ops — intersect
kernel, winner-attribute lookup, material gather, branchless BSDF blend,
radiance/throughput bookkeeping — each reading and writing (N, 3) wavefront
state through HBM. Profiled at the bench wavefront (512x512 rays, Cornell):
raw intersect kernel 0.36 ms but 1.14 ms total per bounce; and the
block-granular dead-ray skip only covered the intersect phase.

This kernel fuses the ENTIRE bounce body over 1024-ray VMEM blocks:

  closest-hit over all packed primitives (same math as intersect_kernel)
  -> winner attributes accumulated IN the loop (outward normal + material
     row), no post-hoc lookup
  -> sky/emission/termination bookkeeping
  -> the full 8-kind branchless BSDF (mirrors ops/materials.scatter
     expression-for-expression, including the shared-azimuth trick)
  -> Russian roulette (optional)
  -> next-ray state write-back

HBM traffic per bounce = read 15 planar (N,) arrays + write 13; everything
else lives in VMEM/registers. The block-level dead-ray skip now covers the
whole bounce: a terminated 1024-ray block costs a pass-through copy.

RNG comes in as a pre-drawn (N, 4) uniform block computed by the SAME
per-ray counter-based keying as the XLA path, so both engines consume
identical random streams and their images agree to float tolerance
(tests/test_bounce_kernel.py asserts this on every preset).

Differentiability: none, by design — grad must flow through the XLA
wavefront path (cfg.fused_bounce=False); attempting to differentiate this
kernel raises with that instruction (custom_vjp bwd raises).

Reference parity: the bounce semantics are Path A's rayColor loop
(main.cu:63-94) + Path B's additive emission (CUDAPathTracer.cu:430,449),
identical to models/integrator.trace.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingthenextweekcuda_tpu.config import EPSILON, FLT_EPSILON
from raytracingthenextweekcuda_tpu.ops.geometry import (
    COAT,
    DIELECTRIC,
    EMISSION,
    LAMBERTIAN,
    METAL,
    PHONG_METAL,
    REFRACTION,
    SPECULAR,
)
from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
    BIG,
    RAY_BLOCK,
)

SKY_WHITE = (1.0, 1.0, 1.0)
SKY_BLUE = (0.5, 0.7, 1.0)

# Row offsets of the 8 material-attribute rows appended to each packed
# primitive array by pack_scene_shaded: kind, albedo rgb, param, emission rgb.
MAT_ROWS = 8

_LANE_MAX = 2**30  # winner-lane sentinel for the leaf-tile argmin


def _mat_rows(materials, material_id):
    """(8, P) material-attribute rows for per-primitive material ids."""
    import jax.numpy as jnp

    sg = jax.lax.stop_gradient
    mid = jnp.maximum(material_id, 0)
    kind = sg(materials.kind)[mid].astype(jnp.float32)
    albedo = sg(materials.albedo)[mid]
    param = sg(materials.param)[mid]
    emis = sg(materials.emission)[mid]
    return jnp.stack(
        [kind, albedo[:, 0], albedo[:, 1], albedo[:, 2], param,
         emis[:, 0], emis[:, 1], emis[:, 2]], axis=0,
    )


def _mat_rows_np(materials, material_id):
    """Numpy _mat_rows for concrete scenes (raises on tracers)."""
    import numpy as np

    g = jax.device_get
    mid = np.maximum(np.asarray(g(material_id)), 0)
    kind = np.asarray(g(materials.kind))[mid].astype(np.float32)
    albedo = np.asarray(g(materials.albedo), np.float32)[mid]
    param = np.asarray(g(materials.param), np.float32)[mid]
    emis = np.asarray(g(materials.emission), np.float32)[mid]
    return np.stack(
        [kind, albedo[:, 0], albedo[:, 1], albedo[:, 2], param,
         emis[:, 0], emis[:, 1], emis[:, 2]], axis=0,
    )


def _merge_parallelograms(verts, mat_id):
    """Detect coplanar triangle pairs that form parallelograms.

    A pair qualifies when it shares an edge, the two opposite vertices are
    reflections through the edge midpoint (within 1e-5 relative), both
    triangles carry the same material, and their windings agree (so
    backface culling is preserved). Each merged pair costs ONE quad
    intersection in the megastep instead of two triangle tests — the same
    spirit as the reference's precomputed v0/E1/E2 ladder step
    (images/images.MD:44-53), applied at the representation level.

    Returns (q_v0, q_e1, q_e2, q_mat, rest_idx): quad parallelogram frames
    (points v0 + u*e1 + v*e2, u,v in [0,1]) and indices of unmerged tris.
    """
    import numpy as np

    T = verts.shape[0]
    edge_map: dict = {}
    for t in range(T):
        for k in range(3):
            a = verts[t, k].tobytes()
            b = verts[t, (k + 1) % 3].tobytes()
            key = (a, b) if a < b else (b, a)
            edge_map.setdefault(key, []).append((t, (k + 2) % 3))
    used = np.zeros(T, bool)
    q_v0, q_e1, q_e2, q_mat = [], [], [], []
    for lst in edge_map.values():
        if len(lst) != 2:
            continue
        (t1, o1), (t2, o2) = lst
        if t1 == t2 or used[t1] or used[t2] or mat_id[t1] != mat_id[t2]:
            continue
        p1, p2 = verts[t1, o1], verts[t2, o2]
        a = verts[t1, (o1 + 1) % 3]
        b = verts[t1, (o1 + 2) % 3]
        scale = max(float(np.abs(verts[t1]).max()), 1e-6)
        if np.abs((a + b - p1) - p2).max() > 1e-5 * scale:
            continue
        n1 = np.cross(verts[t1, 1] - verts[t1, 0], verts[t1, 2] - verts[t1, 0])
        n2 = np.cross(verts[t2, 1] - verts[t2, 0], verts[t2, 2] - verts[t2, 0])
        if np.dot(n1, n2) <= 0.0:  # inconsistent winding: culling would change
            continue
        e1, e2 = a - p1, b - p1
        if np.dot(n1, np.cross(e1, e2)) < 0.0:
            e1, e2 = e2, e1
        used[t1] = used[t2] = True
        q_v0.append(p1)
        q_e1.append(e1)
        q_e2.append(e2)
        q_mat.append(mat_id[t1])
    rest = np.nonzero(~used)[0]
    return (
        np.asarray(q_v0, np.float32).reshape(-1, 3),
        np.asarray(q_e1, np.float32).reshape(-1, 3),
        np.asarray(q_e2, np.float32).reshape(-1, 3),
        np.asarray(q_mat, np.int32).reshape(-1),
        rest,
    )


# Number of geometry rows in a Havel-packed tri/quad array (before MAT_ROWS).
HAVEL_ROWS = 12

# Geometry rows of a packed box (OBB): center (3), unit axes u/v/w (9),
# half extents (3). Material rows follow.
BOX_ROWS = 15


def _merge_boxes(q_v0, q_e1, q_e2, q_mat):
    """Detect groups of 6 parallelogram quads forming a closed box (OBB).

    The reference's Cornell cubes are rotated cube meshes
    (cornellbox2.yaml `cube_small.obj` + rotateY) that quad-merge into 6
    parallelograms each; a closed box admits ONE oriented-slab test
    (~1/3 the vector ops of 6 quad Havel tests and 1/6 the winner
    selects), the representation-level successor of the reference's
    Cube = 6 planes composite (Cube.cu:10-23).

    A 6-quad vertex-connected component qualifies when its corners are
    exactly 8 points c +- hu*u +- hv*v +- hw*w for an orthogonal frame
    (u, v, w), and every quad's outward normal points away from c (so
    backface culling is preserved: entry-face hits only, interior rays
    miss). Quads failing any check stay quads.

    Returns (box_c (B,3), box_axes (B,3,3) unit rows, box_h (B,3),
    box_mat (B,), rest_idx) with rest_idx indexing surviving quads.
    """
    import numpy as np

    Q = q_v0.shape[0]
    if Q < 6:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3, 3), np.float32),
                np.zeros((0, 3), np.float32), np.zeros((0,), np.int32),
                np.arange(Q))
    corners = np.stack(
        [q_v0, q_v0 + q_e1, q_v0 + q_e2, q_v0 + q_e1 + q_e2], axis=1
    )  # (Q, 4, 3)
    # Union-find over exact vertex bytes (merged quads reuse mesh verts).
    parent = list(range(Q))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    vert_owner: dict = {}
    for q in range(Q):
        for k in range(4):
            key = corners[q, k].tobytes()
            if key in vert_owner:
                a, b = find(vert_owner[key]), find(q)
                if a != b:
                    parent[b] = a
            else:
                vert_owner[key] = q
    groups: dict = {}
    for q in range(Q):
        groups.setdefault(find(q), []).append(q)

    used = np.zeros(Q, bool)
    box_c, box_axes, box_h, box_mat = [], [], [], []
    for members in groups.values():
        if len(members) != 6:
            continue
        qs = np.asarray(members)
        if len(set(int(q_mat[q]) for q in qs)) != 1:
            continue
        pts = corners[qs].reshape(-1, 3)
        uniq = np.unique(pts.round(decimals=6), axis=0)
        if uniq.shape[0] != 8:
            continue
        c = uniq.mean(axis=0)
        # Box axes: the 3 distinct (+-) edge directions among the quads.
        edges = np.concatenate([q_e1[qs], q_e2[qs]], axis=0)  # (12, 3)
        lens = np.linalg.norm(edges, axis=1)
        if (lens < 1e-12).any():
            continue
        dirs = edges / lens[:, None]
        axes = []
        ok = True
        for d, ln in zip(dirs, lens):
            for a, _ in axes:
                if abs(np.dot(d, a)) > 1.0 - 1e-5:
                    break
            else:
                axes.append((d, ln))
        if len(axes) != 3:
            continue
        A = np.stack([a for a, _ in axes])       # (3, 3)
        H = np.asarray([ln for _, ln in axes]) * 0.5
        # Orthogonal frame?
        G = A @ A.T
        if np.abs(G - np.eye(3)).max() > 1e-4:
            continue
        # All 8 corners are c +- H*axes?
        loc = (uniq - c) @ A.T                   # (8, 3) local coords
        scale = max(float(np.abs(uniq).max()), 1e-6)
        if np.abs(np.abs(loc) - H[None, :]).max() > 1e-4 * scale:
            ok = False
        # Outward-facing quads (culling parity).
        if ok:
            for q in qs:
                n = np.cross(q_e1[q], q_e2[q])
                qc = corners[q].mean(axis=0)
                if np.dot(n, qc - c) <= 0.0:
                    ok = False
                    break
        if not ok:
            continue
        used[qs] = True
        box_c.append(c)
        box_axes.append(A)
        box_h.append(H)
        box_mat.append(int(q_mat[qs[0]]))
    rest = np.nonzero(~used)[0]
    return (
        np.asarray(box_c, np.float32).reshape(-1, 3),
        np.asarray(box_axes, np.float32).reshape(-1, 3, 3),
        np.asarray(box_h, np.float32).reshape(-1, 3),
        np.asarray(box_mat, np.int32).reshape(-1),
        rest,
    )


def _pack_boxes(box_c, box_axes, box_h, box_mat, materials):
    """Box arrays -> (BOX_ROWS + MAT_ROWS, pad128) planar rows."""
    import numpy as np

    from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
        _pad128,
    )

    B = box_c.shape[0]
    out = np.zeros((BOX_ROWS + MAT_ROWS, _pad128(B)), np.float32)
    if B:
        out[0:3, :B] = box_c.T
        out[3:12, :B] = box_axes.reshape(B, 9).T
        # Padding columns have h = 0 -> tn = tf = degenerate -> never hit
        # (the kernel requires tn >= tmin with tn from +-0 slabs).
        out[12:15, :B] = box_h.T
        out[BOX_ROWS:, :B] = _mat_rows_np(materials, box_mat)
    return jnp.asarray(out)


def _pack_havel(v0, e1, e2, mat_id, materials):
    """(K, 3) parallelogram/triangle frames -> (20, pad128) Havel rows.

    Rows: unit normal (3), plane offset dc = n̂·v0, edge plane 1 (3) + d1,
    edge plane 2 (3) + d2, then the 8 material-attribute rows. The hit test
    is then t = (dc - n̂·o)/(n̂·d); u = e1p·h + d1; v = e2p·h + d2 — the
    same precomputed-plane formulation the reference bakes per triangle
    (Loader.cpp:189-201, consumed CUDAPathTracer.cu:294-326), at 2/3 the
    vector-op count of in-loop Möller–Trumbore.
    """
    import numpy as np

    from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
        _pad128,
    )

    K = v0.shape[0]
    out = np.zeros((HAVEL_ROWS + MAT_ROWS, _pad128(K)), np.float32)
    if K:
        n = np.cross(e1, e2)
        nn = np.maximum((n * n).sum(-1, keepdims=True), 1e-30)
        n_unit = n / np.sqrt(nn)
        e1p = np.cross(e2, n) / nn
        e2p = np.cross(n, e1) / nn
        out[0:3, :K] = n_unit.T
        out[3, :K] = (n_unit * v0).sum(-1)
        out[4:7, :K] = e1p.T
        out[7, :K] = -(e1p * v0).sum(-1)
        out[8:11, :K] = e2p.T
        out[11, :K] = -(e2p * v0).sum(-1)
        out[HAVEL_ROWS:, :K] = _mat_rows_np(
            materials, np.asarray(mat_id, np.int32)
        )
    # Padding columns: n̂ = 0 -> dn = 0 -> gate fails, never hit.
    return jnp.asarray(out)


def pack_scene_shaded(scene, tile_bvh=None, merge_quads=True):
    """PackedScene whose per-type arrays carry 8 extra material rows.

    Layout: base rows from intersect_kernel.pack_scene (spheres 10,
    planes 13, triangles 9) + [kind, albedo_r/g/b, param, emis_r/g/b].
    The base rows are bit-identical to pack_scene's, so intersect_packed
    consumers could share this array; it is kept separate to avoid
    repacking costs showing up on the differentiable path.

    Brute-force meshes (no tile_bvh) additionally get Havel-packed
    geometry (`trih`/`quadh`, see _pack_havel) with parallelogram pairs
    merged into quads (`merge_quads`) — the megastep's fast path. Skipped
    under jit (tracer vertices): the megastep then falls back to in-loop
    Möller–Trumbore on the base rows.

    `tile_bvh` (ops/bvh_tile.TileBVH): when given, scene.triangles is
    ASSUMED already permuted into the BVH's leaf-tile order (models.scene.
    finalize does this), and the node arrays ride along for the megastep's
    block-consensus traversal.
    """
    import numpy as np

    from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
        PackedScene,
        pack_scene,
        pack_scene_host,
    )

    # Host (numpy) packing when the scene is concrete — finalize-time. The
    # eager jnp fallback compiles ~70 one-off XLA programs per scene (~90 s
    # through the TPU relay); it remains only for tracer scenes (on-device
    # repacking inside jitted fit steps), which never carry a tile-BVH.
    try:
        base = pack_scene_host(scene, include_triangles=True, to_jnp=False)
        host = True
    except jax.errors.TracerArrayConversionError:
        if tile_bvh is not None:
            raise AssertionError(
                "tile-BVH packing requires concrete (host-built) geometry; "
                "got tracer scene arrays"
            ) from None
        base = pack_scene(scene, include_triangles=True)
        host = False
    S, P, T = base.counts

    if host:
        def extend(arr, prim, count):
            out = np.zeros((arr.shape[0] + MAT_ROWS, arr.shape[1]),
                           np.float32)
            out[: arr.shape[0]] = arr
            if count:
                out[arr.shape[0]:, :count] = _mat_rows_np(
                    scene.materials, prim.material_id
                )
            return jnp.asarray(out)
    else:
        def extend(arr, prim, count):
            rows = jnp.zeros((MAT_ROWS, arr.shape[1]), arr.dtype)
            if count:
                rows = rows.at[:, :count].set(
                    _mat_rows(scene.materials, prim.material_id)
                )
            return jnp.concatenate([arr, rows], axis=0)

    bvh_bounds = bvh_meta = None
    leaf_bounds = leaf_tiles = None
    trih = quadh = None
    hcounts = (0, 0, 0)
    if tile_bvh is not None:
        assert tile_bvh.padded_tri_count == T, (
            f"triangles ({T}) not in tile order ({tile_bvh.padded_tri_count})"
        )
        bvh_bounds = jnp.asarray(tile_bvh.bounds, jnp.float32)
        meta3 = np.asarray(tile_bvh.meta)
        # Leaf-only views for the work-list winner kernel
        # (ops/pallas/bvh_winner_kernel.py).
        leaves_mask = meta3[0] == 1
        leaf_bounds = jnp.asarray(
            np.asarray(tile_bvh.bounds)[:, leaves_mask], jnp.float32
        )
        leaf_tiles = jnp.asarray(meta3[1][leaves_mask][None, :], jnp.int32)
        # Rows 3-4: leaf-tile range [tile_lo, tile_hi) covered by each
        # subtree. DFS preorder emits leaf tiles in increasing tile_start
        # order, so subtree [i, skip) covers a CONTIGUOUS tile range —
        # leaves_before[i]*LEAF .. leaves_before[skip]*LEAF. The megastep's
        # post-traversal winner-resolution sweep descends only into
        # subtrees containing some ray's winning tile.
        leaf_size = T // max(int((meta3[0] == 1).sum()), 1)
        leaves_before = np.concatenate(
            [[0], np.cumsum(meta3[0] == 1)]
        ).astype(np.int32)
        tile_lo = leaves_before[np.arange(meta3.shape[1])] * leaf_size
        tile_hi = leaves_before[meta3[2]] * leaf_size
        bvh_meta = jnp.asarray(
            np.concatenate([meta3, tile_lo[None], tile_hi[None]], axis=0),
            jnp.int32,
        )
        # Havel-packed leaf tiles: the traversal's leaf test uses the same
        # precomputed plane + edge-plane rows as the brute fast path
        # (reference parity: Loader.cpp:189-201 / CUDAPathTracer.cu:294-326).
        # Padding slots (zero vertices) give a zero normal -> never hit.
        verts = np.asarray(jax.device_get(scene.triangles.vertices))
        mids = np.asarray(jax.device_get(scene.triangles.material_id))
        v0 = verts[:, 0]
        trih = _pack_havel(
            v0, verts[:, 1] - v0, verts[:, 2] - v0, mids, scene.materials
        )
        quadh = jnp.zeros((HAVEL_ROWS + MAT_ROWS, 1), jnp.float32)

    boxh = None
    if tile_bvh is None and T:
        try:
            verts = np.asarray(jax.device_get(scene.triangles.vertices))
            mids = np.asarray(jax.device_get(scene.triangles.material_id))
        except jax.errors.TracerArrayConversionError:
            verts = None
        if verts is not None:
            if merge_quads:
                qv0, qe1, qe2, qmat, rest = _merge_parallelograms(verts, mids)
                (b_c, b_axes, b_h, b_mat,
                 qrest) = _merge_boxes(qv0, qe1, qe2, qmat)
                qv0, qe1, qe2, qmat = (qv0[qrest], qe1[qrest], qe2[qrest],
                                       qmat[qrest])
            else:
                qv0 = qe1 = qe2 = np.zeros((0, 3), np.float32)
                qmat = np.zeros((0,), np.int32)
                rest = np.arange(T)
                b_c = np.zeros((0, 3), np.float32)
                b_axes = np.zeros((0, 3, 3), np.float32)
                b_h = np.zeros((0, 3), np.float32)
                b_mat = np.zeros((0,), np.int32)
            v0 = verts[rest, 0]
            trih = _pack_havel(
                v0, verts[rest, 1] - v0, verts[rest, 2] - v0,
                mids[rest], scene.materials,
            )
            quadh = _pack_havel(qv0, qe1, qe2, qmat, scene.materials)
            boxh = _pack_boxes(b_c, b_axes, b_h, b_mat, scene.materials)
            hcounts = (int(rest.shape[0]), int(qmat.shape[0]),
                       int(b_mat.shape[0]))

    return PackedScene(
        extend(base.spheres, scene.spheres, S),
        extend(base.planes, scene.planes, P),
        extend(base.triangles, scene.triangles, T),
        base.counts,
        base.used_kinds,
        shaded=True,
        bvh_bounds=bvh_bounds,
        bvh_meta=bvh_meta,
        trih=trih,
        quadh=quadh,
        hcounts=hcounts,
        has_emission=base.has_emission,
        leaf_bounds=leaf_bounds,
        leaf_tiles=leaf_tiles,
        boxh=boxh,
    )


def _bounce_core(
    ox, oy, oz, dx, dy, dz, tm, alive,
    tpx, tpy, tpz, rx, ry, rz,
    u0, u1, u2, u3, do_rr,
    sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref,
    bvh_b_ref, bvh_m_ref,
    *, n_sph: int, n_pla: int, n_tri: int, n_trih: int, n_quad: int,
    n_box: int, n_bvh_nodes: int, tmin: float,
    backface_cull: bool, sky: bool, used_kinds, russian_roulette: bool,
    additive_emission: bool, sb: int, pb: int, tb: int,
    leaf_tile: int = 128,
):
    """One whole bounce on in-register wavefront values.

    Shared by the per-bounce megastep kernel (`_bounce_kernel`) and the
    whole-path kernel (`_path_kernel`). All args are (rows, 128) arrays
    except `do_rr` (traced bool scalar) and the scene refs. Returns the
    advanced state tuple (ox..dz, tpx..z, rx..z, cont_bool).
    """
    shape = ox.shape

    def _use(k):
        return used_kinds is None or k in used_kinds

    if True:  # keep the original body's indentation
        best_t = jnp.full(shape, BIG, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        a = dx * dx + dy * dy + dz * dz  # |d|^2, ray-invariant across prims
        # Winner attributes, accumulated inside the primitive loops.
        w_nx, w_ny, w_nz = zero, zero, zero          # outward normal
        w_kind = jnp.full(shape, -1.0, jnp.float32)  # material kind (-1 miss)
        w_ar, w_ag, w_ab = zero, zero, zero          # albedo
        w_par = zero                                  # param
        w_er, w_eg, w_eb = zero, zero, zero          # additive emission

        def take(win, new, old):
            return jnp.where(win, new, old)

        def take_e(win, new, old):
            # Additive-emission winner rows: statically elided when no
            # material emits (the carried zeros pass through, op-free).
            return jnp.where(win, new, old) if additive_emission else old

        carry0 = (best_t, w_kind, w_nx, w_ny, w_nz,
                  w_ar, w_ag, w_ab, w_par, w_er, w_eg, w_eb)

        def sphere_body(i, carry):
            (best_t, w_kind, w_nx, w_ny, w_nz,
             w_ar, w_ag, w_ab, w_par, w_er, w_eg, w_eb) = carry
            w = (tm - sph_ref[6, i]) * sph_ref[7, i]
            cx = sph_ref[0, i] + sph_ref[3, i] * w
            cy = sph_ref[1, i] + sph_ref[4, i] * w
            cz = sph_ref[2, i] + sph_ref[5, i] * w
            r = sph_ref[8, i]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
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
            win = ok & (in0 | in1)
            inv_r = 1.0 / jnp.where(r != 0.0, r, 1.0)
            return (
                take(win, t, best_t),
                take(win, sph_ref[sb + 0, i], w_kind),
                take(win, (ox + t * dx - cx) * inv_r, w_nx),
                take(win, (oy + t * dy - cy) * inv_r, w_ny),
                take(win, (oz + t * dz - cz) * inv_r, w_nz),
                take(win, sph_ref[sb + 1, i], w_ar),
                take(win, sph_ref[sb + 2, i], w_ag),
                take(win, sph_ref[sb + 3, i], w_ab),
                take(win, sph_ref[sb + 4, i], w_par),
                take_e(win, sph_ref[sb + 5, i], w_er),
                take_e(win, sph_ref[sb + 6, i], w_eg),
                take_e(win, sph_ref[sb + 7, i], w_eb),
            )

        def plane_body(i, carry):
            (best_t, w_kind, w_nx, w_ny, w_nz,
             w_ar, w_ag, w_ab, w_par, w_er, w_eg, w_eb) = carry
            nx, ny, nz = pla_ref[3, i], pla_ref[4, i], pla_ref[5, i]
            denom = dx * nx + dy * ny + dz * nz
            two_sided = pla_ref[12, i] > 0.5
            gate = (jnp.abs(denom) > EPSILON) & two_sided | (
                (denom > EPSILON) & jnp.logical_not(two_sided)
            )
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
            win = gate & inside & (t >= tmin) & (t < best_t)
            return (
                take(win, t, best_t),
                take(win, pla_ref[pb + 0, i], w_kind),
                take(win, jnp.full(shape, nx), w_nx),
                take(win, jnp.full(shape, ny), w_ny),
                take(win, jnp.full(shape, nz), w_nz),
                take(win, pla_ref[pb + 1, i], w_ar),
                take(win, pla_ref[pb + 2, i], w_ag),
                take(win, pla_ref[pb + 3, i], w_ab),
                take(win, pla_ref[pb + 4, i], w_par),
                take_e(win, pla_ref[pb + 5, i], w_er),
                take_e(win, pla_ref[pb + 6, i], w_eg),
                take_e(win, pla_ref[pb + 7, i], w_eb),
            )

        def tri_body(i, carry):
            (best_t, w_kind, w_nx, w_ny, w_nz,
             w_ar, w_ag, w_ab, w_par, w_er, w_eg, w_eb) = carry
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
            win = (
                ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > tmin) & (t < best_t)
            )
            # Geometric normal = normalize(cross(e1, e2)) — scalar per prim.
            gnx = e1y * e2z - e1z * e2y
            gny = e1z * e2x - e1x * e2z
            gnz = e1x * e2y - e1y * e2x
            gil = jax.lax.rsqrt(
                jnp.maximum(gnx * gnx + gny * gny + gnz * gnz, 1e-30)
            )
            return (
                take(win, t, best_t),
                take(win, tri_ref[tb + 0, i], w_kind),
                take(win, jnp.full(shape, gnx * gil), w_nx),
                take(win, jnp.full(shape, gny * gil), w_ny),
                take(win, jnp.full(shape, gnz * gil), w_nz),
                take(win, tri_ref[tb + 1, i], w_ar),
                take(win, tri_ref[tb + 2, i], w_ag),
                take(win, tri_ref[tb + 3, i], w_ab),
                take(win, tri_ref[tb + 4, i], w_par),
                take_e(win, tri_ref[tb + 5, i], w_er),
                take_e(win, tri_ref[tb + 6, i], w_eg),
                take_e(win, tri_ref[tb + 7, i], w_eb),
            )

        def make_havel_body(ref, hb, quad):
            """Precomputed plane + edge-plane test (reference parity:
            Loader.cpp:189-201 precompute, CUDAPathTracer.cu:294-326 test).
            `quad` statically selects the parallelogram uv bound."""

            def h_body(i, carry):
                (best_t, w_kind, w_nx, w_ny, w_nz,
                 w_ar, w_ag, w_ab, w_par, w_er, w_eg, w_eb) = carry
                nx, ny, nz = ref[0, i], ref[1, i], ref[2, i]
                dn = dx * nx + dy * ny + dz * nz
                if backface_cull:
                    ok = dn < -FLT_EPSILON
                else:
                    ok = jnp.abs(dn) > FLT_EPSILON
                inv = 1.0 / jnp.where(ok, dn, 1.0)
                t = (ref[3, i] - (ox * nx + oy * ny + oz * nz)) * inv
                hx = ox + t * dx
                hy = oy + t * dy
                hz = oz + t * dz
                u = ref[4, i] * hx + ref[5, i] * hy + ref[6, i] * hz + ref[7, i]
                v = ref[8, i] * hx + ref[9, i] * hy + ref[10, i] * hz + ref[11, i]
                if quad:
                    uv_ok = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
                else:
                    uv_ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                win = ok & uv_ok & (t > tmin) & (t < best_t)
                return (
                    take(win, t, best_t),
                    take(win, ref[hb + 0, i], w_kind),
                    take(win, jnp.full(shape, nx), w_nx),
                    take(win, jnp.full(shape, ny), w_ny),
                    take(win, jnp.full(shape, nz), w_nz),
                    take(win, ref[hb + 1, i], w_ar),
                    take(win, ref[hb + 2, i], w_ag),
                    take(win, ref[hb + 3, i], w_ab),
                    take(win, ref[hb + 4, i], w_par),
                    take_e(win, ref[hb + 5, i], w_er),
                    take_e(win, ref[hb + 6, i], w_eg),
                    take_e(win, ref[hb + 7, i], w_eb),
                )

            return h_body

        def box_body(i, carry):
            """Oriented-box slab test (the 6-quad cube collapsed to one
            primitive — bounce_kernel._merge_boxes). Entry-face hits only
            (tn >= tmin), matching the culled closed quad shell: interior
            and tangent rays miss. Normal = the entry slab's outward axis."""
            (best_t, w_kind, w_nx, w_ny, w_nz,
             w_ar, w_ag, w_ab, w_par, w_er, w_eg, w_eb) = carry
            eps_b = 1e-20
            relx = ox - box_ref[0, i]
            rely = oy - box_ref[1, i]
            relz = oz - box_ref[2, i]
            tn = jnp.full(shape, -BIG, jnp.float32)
            tf = jnp.full(shape, BIG, jnp.float32)
            nxw = jnp.zeros(shape, jnp.float32)
            nyw = jnp.zeros(shape, jnp.float32)
            nzw = jnp.zeros(shape, jnp.float32)
            if not backface_cull:
                exw = (jnp.zeros(shape, jnp.float32),
                       jnp.zeros(shape, jnp.float32),
                       jnp.zeros(shape, jnp.float32))
            for axis in range(3):
                axx = box_ref[3 + 3 * axis, i]
                axy = box_ref[4 + 3 * axis, i]
                axz = box_ref[5 + 3 * axis, i]
                h = box_ref[12 + axis, i]
                ol = relx * axx + rely * axy + relz * axz
                dl = dx * axx + dy * axy + dz * axz
                dls = jnp.where(jnp.abs(dl) < eps_b,
                                jnp.where(dl >= 0.0, eps_b, -eps_b), dl)
                inv = 1.0 / dls
                t0 = (-h - ol) * inv
                t1 = (h - ol) * inv
                tna = jnp.minimum(t0, t1)
                tfa = jnp.maximum(t0, t1)
                upd = tna > tn
                s = jnp.where(dl >= 0.0, -1.0, 1.0)
                nxw = jnp.where(upd, s * axx, nxw)
                nyw = jnp.where(upd, s * axy, nyw)
                nzw = jnp.where(upd, s * axz, nzw)
                if not backface_cull:
                    upd2 = tfa < tf
                    exw = (jnp.where(upd2, -s * axx, exw[0]),
                           jnp.where(upd2, -s * axy, exw[1]),
                           jnp.where(upd2, -s * axz, exw[2]))
                tn = jnp.maximum(tn, tna)
                tf = jnp.minimum(tf, tfa)
            win = (tf >= tn) & (tn >= tmin) & (tn < best_t)
            t_box = tn
            if not backface_cull:
                # Two-sided shell: interior origins hit the EXIT face at tf
                # (outward geometric normal; face_normal flips downstream).
                inside = (tf >= tn) & (tn < tmin) & (tf >= tmin) & (
                    tf < best_t
                )
                t_box = jnp.where(inside, tf, t_box)
                nxw = jnp.where(inside, exw[0], nxw)
                nyw = jnp.where(inside, exw[1], nyw)
                nzw = jnp.where(inside, exw[2], nzw)
                win = win | inside
            return (
                take(win, t_box, best_t),
                take(win, box_ref[bb + 0, i], w_kind),
                take(win, nxw, w_nx),
                take(win, nyw, w_ny),
                take(win, nzw, w_nz),
                take(win, box_ref[bb + 1, i], w_ar),
                take(win, box_ref[bb + 2, i], w_ag),
                take(win, box_ref[bb + 3, i], w_ab),
                take(win, box_ref[bb + 4, i], w_par),
                take_e(win, box_ref[bb + 5, i], w_er),
                take_e(win, box_ref[bb + 6, i], w_eg),
                take_e(win, box_ref[bb + 7, i], w_eb),
            )

        bb = BOX_ROWS
        carry = carry0
        UNROLL = 128  # full unroll below this prim count (counts are static)
        bodies = [(n_sph, sphere_body), (n_pla, plane_body)]
        if not n_bvh_nodes:
            if n_trih or n_quad or n_box:
                # Havel fast path: quad-merged precomputed-plane tests,
                # closed cubes collapsed to oriented-box slab tests.
                bodies.append(
                    (n_trih, make_havel_body(trih_ref, HAVEL_ROWS, False))
                )
                bodies.append(
                    (n_quad, make_havel_body(quad_ref, HAVEL_ROWS, True))
                )
                bodies.append((n_box, box_body))
            else:
                bodies.append((n_tri, tri_body))
        for count, body in bodies:
            if not count:
                continue
            if count <= UNROLL:
                for i in range(count):
                    carry = body(i, carry)
            else:
                carry = jax.lax.fori_loop(0, count, body, carry)

        if n_bvh_nodes:
            # ---- consensus skip-pointer BVH over Havel lane-tile leaves ----
            # All rays of a block walk the SAME DFS node sequence (scalar
            # control flow, bounds in SMEM); a subtree is skipped when no
            # live ray hits its AABB. Within a leaf visit, consensus drops
            # to ROW granularity: each (1, 128) row of consecutive sorted
            # rays evaluates the 128-triangle tile only if one of ITS rays
            # hit the node bound (sorted rows are ~128-ray spatial clusters,
            # so this skips most of the block's wasted lanes). The leaf test
            # is the precomputed plane + edge-plane (Havel) form, and only
            # (t, tile, lane) of the winner is tracked — attributes are
            # resolved AFTER traversal by one sweep that descends only into
            # subtrees containing some ray's winning tile (meta rows 3-4).
            # See ops/bvh_tile.py for why per-ray stacks don't map to TPU.
            o1 = lambda v: v[..., None]
            eps_d = 1e-20
            sdx = jnp.where(jnp.abs(dx) < eps_d,
                            jnp.where(dx >= 0.0, eps_d, -eps_d), dx)
            sdy = jnp.where(jnp.abs(dy) < eps_d,
                            jnp.where(dy >= 0.0, eps_d, -eps_d), dy)
            sdz = jnp.where(jnp.abs(dz) < eps_d,
                            jnp.where(dz >= 0.0, eps_d, -eps_d), dz)
            inv_dx, inv_dy, inv_dz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz
            n_rows = shape[0]
            lane_iota_row = jax.lax.broadcasted_iota(
                jnp.int32, (1, shape[1], 128), 2
            )

            def hav(row, tile):
                return trih_ref[row, pl.ds(pl.multiple_of(tile, 128), 128)][
                    None, None, :
                ]

            w_tile = jnp.full(shape, -1, jnp.int32)  # winning leaf tile
            w_lane = jnp.zeros(shape, jnp.int32)     # lane within the tile

            def leaf_visit(tile, node_hit, best_t, w_tile, w_lane):
                nx = hav(0, tile)
                ny = hav(1, tile)
                nz = hav(2, tile)
                dc = hav(3, tile)
                e1px, e1py, e1pz, d1 = (hav(4, tile), hav(5, tile),
                                        hav(6, tile), hav(7, tile))
                e2px, e2py, e2pz, d2 = (hav(8, tile), hav(9, tile),
                                        hav(10, tile), hav(11, tile))
                out_t, out_tile, out_lane = [], [], []
                for r in range(n_rows):
                    rs = slice(r, r + 1)

                    def eval_row(args, rs=rs):
                        bt, wt, wl = args  # (1, 128) each
                        dxr, dyr, dzr = (o1(dx[rs]), o1(dy[rs]), o1(dz[rs]))
                        oxr, oyr, ozr = (o1(ox[rs]), o1(oy[rs]), o1(oz[rs]))
                        dn = dxr * nx + dyr * ny + dzr * nz
                        if backface_cull:
                            okt = dn < -FLT_EPSILON
                        else:
                            okt = jnp.abs(dn) > FLT_EPSILON
                        inv = 1.0 / jnp.where(okt, dn, 1.0)
                        t = (dc - (oxr * nx + oyr * ny + ozr * nz)) * inv
                        hx = oxr + t * dxr
                        hy = oyr + t * dyr
                        hz = ozr + t * dzr
                        u = e1px * hx + e1py * hy + e1pz * hz + d1
                        v = e2px * hx + e2py * hy + e2pz * hz + d2
                        # Widen the row mask to i32: Mosaic cannot insert a
                        # minor dim on an i1 vector.
                        hit = (
                            okt & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                            & (t > tmin) & (t < o1(bt))
                            & (o1(node_hit[rs].astype(jnp.int32)) != 0)
                        )
                        t_masked = jnp.where(hit, t, BIG)
                        tile_best = jnp.min(t_masked, axis=-1)   # (1, 128)
                        improved = tile_best < bt
                        is_best = hit & (t_masked <= o1(tile_best))
                        win_lane = jnp.min(
                            jnp.where(is_best, lane_iota_row, _LANE_MAX),
                            axis=-1,
                        )
                        return (
                            jnp.where(improved, tile_best, bt),
                            jnp.where(improved, tile, wt),
                            jnp.where(improved, win_lane, wl),
                        )

                    row_any = jnp.any(node_hit[rs])
                    bt, wt, wl = jax.lax.cond(
                        row_any, eval_row, lambda a: a,
                        (best_t[rs], w_tile[rs], w_lane[rs]),
                    )
                    out_t.append(bt)
                    out_tile.append(wt)
                    out_lane.append(wl)
                return (
                    jnp.concatenate(out_t, axis=0),
                    jnp.concatenate(out_tile, axis=0),
                    jnp.concatenate(out_lane, axis=0),
                )

            def t_cond(c):
                return c[0] < n_bvh_nodes

            def t_body(c):
                node, best_t, w_tile, w_lane = c
                lo_x, lo_y, lo_z = (bvh_b_ref[0, node], bvh_b_ref[1, node],
                                    bvh_b_ref[2, node])
                hi_x, hi_y, hi_z = (bvh_b_ref[3, node], bvh_b_ref[4, node],
                                    bvh_b_ref[5, node])
                t0 = (lo_x - ox) * inv_dx
                t1 = (hi_x - ox) * inv_dx
                tn = jnp.minimum(t0, t1)
                tf = jnp.maximum(t0, t1)
                t0 = (lo_y - oy) * inv_dy
                t1 = (hi_y - oy) * inv_dy
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                t0 = (lo_z - oz) * inv_dz
                t1 = (hi_z - oz) * inv_dz
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                node_hit = (tf >= tn) & (tf >= tmin) & (tn < best_t) & alive
                any_hit = jnp.any(node_hit)
                is_leaf = bvh_m_ref[0, node] == 1
                tile = bvh_m_ref[1, node]
                skip = bvh_m_ref[2, node]
                def visit_leaf_chunks(a):
                    # Leaves are `leaf_tile` triangles wide; the Havel
                    # eval is one 128-lane tile, so wide leaves visit
                    # their 128-wide chunks in a static unroll (w_tile
                    # records the winning CHUNK start in triangle units).
                    for sub in range(leaf_tile // 128):
                        a = leaf_visit(tile + 128 * sub, node_hit, *a)
                    return a

                best_t, w_tile, w_lane = jax.lax.cond(
                    any_hit & is_leaf,
                    visit_leaf_chunks,
                    lambda a: a,
                    (best_t, w_tile, w_lane),
                )
                nxt = jnp.where(any_hit & jnp.logical_not(is_leaf),
                                node + 1, skip)
                return (nxt, best_t, w_tile, w_lane)

            _, bvh_t, w_tile, w_lane = jax.lax.while_loop(
                t_cond, t_body, (jnp.int32(0), carry[0], w_tile, w_lane)
            )

            # ---- winner-attribute resolution sweep --------------------
            # Descend only into subtrees whose leaf-tile range contains
            # some ray's winning tile; at those leaves, extract the 11
            # attribute rows for exactly the rays that won there. Havel
            # rows 0-2 are the unit normal, so no cross product is needed.
            lane_iota = jax.lax.broadcasted_iota(
                jnp.int32, (shape[0], shape[1], 128), 2
            )
            hb = HAVEL_ROWS

            def resolve(tile, carry):
                (w_kind, w_nx, w_ny, w_nz,
                 w_ar, w_ag, w_ab, w_par, w_er, w_eg, w_eb) = carry
                ray_sel = w_tile == tile                      # (ROWS, 128)
                sel = (o1(ray_sel.astype(jnp.int32)) != 0) & (
                    lane_iota == o1(w_lane)
                )

                def extract(row3):
                    return jnp.sum(jnp.where(sel, row3, 0.0), axis=-1)

                return (
                    jnp.where(ray_sel, extract(hav(hb + 0, tile)), w_kind),
                    jnp.where(ray_sel, extract(hav(0, tile)), w_nx),
                    jnp.where(ray_sel, extract(hav(1, tile)), w_ny),
                    jnp.where(ray_sel, extract(hav(2, tile)), w_nz),
                    jnp.where(ray_sel, extract(hav(hb + 1, tile)), w_ar),
                    jnp.where(ray_sel, extract(hav(hb + 2, tile)), w_ag),
                    jnp.where(ray_sel, extract(hav(hb + 3, tile)), w_ab),
                    jnp.where(ray_sel, extract(hav(hb + 4, tile)), w_par),
                    jnp.where(ray_sel, extract(hav(hb + 5, tile)), w_er)
                    if additive_emission else w_er,
                    jnp.where(ray_sel, extract(hav(hb + 6, tile)), w_eg)
                    if additive_emission else w_eg,
                    jnp.where(ray_sel, extract(hav(hb + 7, tile)), w_eb)
                    if additive_emission else w_eb,
                )

            def r_cond(c):
                return c[0] < n_bvh_nodes

            def r_body(c):
                node = c[0]
                attr = c[1:]
                is_leaf = bvh_m_ref[0, node] == 1
                tile = bvh_m_ref[1, node]
                skip = bvh_m_ref[2, node]
                t_lo = bvh_m_ref[3, node]
                t_hi = bvh_m_ref[4, node]
                # w_tile is -1 for rays the mesh did not win (t_lo >= 0).
                inb = (w_tile >= t_lo) & (w_tile < t_hi)
                any_in = jnp.any(inb)
                def resolve_leaf_chunks(a):
                    for sub in range(leaf_tile // 128):
                        a = resolve(tile + 128 * sub, a)
                    return a

                attr = jax.lax.cond(
                    any_in & is_leaf,
                    resolve_leaf_chunks,
                    lambda a: a,
                    attr,
                )
                nxt = jnp.where(any_in & jnp.logical_not(is_leaf),
                                node + 1, skip)
                return (nxt, *attr)

            import os as _os
            if _os.environ.get("RTNW_SKIP_RESOLVE"):  # timing probe only
                carry = (bvh_t, *carry[1:])
            else:
                out = jax.lax.while_loop(
                    r_cond, r_body, (jnp.int32(0), *carry[1:])
                )
                carry = (bvh_t, *out[1:])

        (best_t, w_kind, w_nx, w_ny, w_nz,
         w_ar, w_ag, w_ab, w_par, w_er, w_eg, w_eb) = carry

        valid = w_kind >= 0.0

        # ---- face the normal toward the ray (HitResult::setFaceNormal) ----
        d_dot_n = dx * w_nx + dy * w_ny + dz * w_nz
        front = d_dot_n < FLT_EPSILON
        sgn = jnp.where(front, 1.0, -1.0)
        nx_, ny_, nz_ = w_nx * sgn, w_ny * sgn, w_nz * sgn

        # ---- unit incoming direction ----
        il = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
        ux, uy, uz = dx * il, dy * il, dz * il

        # ---- shared azimuth (ops/materials.scatter parity) ----
        two_pi = 6.283185307179586
        phi = two_pi * u1
        cos_phi = jnp.cos(phi)
        sin_phi = jnp.sin(phi)

        def azimuth(z):
            r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
            return r * cos_phi, r * sin_phi, z

        def normalize3(x, y, z):
            inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
            return x * inv, y * inv, z * inv

        # mirror = u - 2 dot(u, n) n
        u_dot_n = ux * nx_ + uy * ny_ + uz * nz_
        mx = ux - 2.0 * u_dot_n * nx_
        my = uy - 2.0 * u_dot_n * ny_
        mz = uz - 2.0 * u_dot_n * nz_

        def is_kind(k):
            return w_kind == float(k)

        # ---- Lambertian ----
        avx, avy, avz = azimuth(1.0 - 2.0 * u0)
        if _use(LAMBERTIAN):
            lrx, lry, lrz = nx_ + avx, ny_ + avy, nz_ + avz
            nzero = (jnp.abs(lrx) < 1e-8) & (jnp.abs(lry) < 1e-8) & (jnp.abs(lrz) < 1e-8)
            lrx = jnp.where(nzero, nx_, lrx)
            lry = jnp.where(nzero, ny_, lry)
            lrz = jnp.where(nzero, nz_, lrz)
            sdx, sdy, sdz = normalize3(lrx, lry, lrz)
        else:
            sdx, sdy, sdz = nx_, ny_, nz_

        # Tangent frame about an axis, shared azimuth (Frisvad/Pixar).
        def frame_lobe(ax, ay, az, cos_t):
            s = jnp.where(az >= 0.0, 1.0, -1.0)
            a = -1.0 / (s + az)
            b = ax * ay * a
            t0x, t0y, t0z = 1.0 + s * ax * ax * a, s * b, -s * ax
            t1x, t1y, t1z = b, s + ay * ay * a, -ay
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cp, sp = cos_phi * sin_t, sin_phi * sin_t
            return (
                t0x * cp + t1x * sp + ax * cos_t,
                t0y * cp + t1y * sp + ay * cos_t,
                t0z * cp + t1z * sp + az * cos_t,
            )

        white_atten = jnp.ones(shape, jnp.float32)
        atr, atg, atb = w_ar, w_ag, w_ab
        scattered = jnp.logical_not(is_kind(EMISSION))

        # ---- Metal (fuzz ball + absorption) ----
        if _use(METAL):
            fuzz = jnp.minimum(w_par, 1.0)
            ballr = jnp.exp(jnp.log(jnp.maximum(u2, 1e-12)) / 3.0)
            bx, by, bz = avx * ballr, avy * ballr, avz * ballr
            mrx = mx + fuzz * bx
            mry = my + fuzz * by
            mrz = mz + fuzz * bz
            metal_ok = (mrx * nx_ + mry * ny_ + mrz * nz_) > 0.0
            gx = jnp.where(metal_ok, mrx, mx)
            gy = jnp.where(metal_ok, mry, my)
            gz = jnp.where(metal_ok, mrz, mz)
            gx, gy, gz = normalize3(gx, gy, gz)
            sel = is_kind(METAL)
            sdx = jnp.where(sel, gx, sdx)
            sdy = jnp.where(sel, gy, sdy)
            sdz = jnp.where(sel, gz, sdz)
            okf = metal_ok.astype(jnp.float32)
            atr = jnp.where(sel, w_ar * okf, atr)
            atg = jnp.where(sel, w_ag * okf, atg)
            atb = jnp.where(sel, w_ab * okf, atb)
            scattered = scattered & jnp.logical_not(sel & jnp.logical_not(metal_ok))

        # ---- Dielectric (Schlick + TIR) ----
        if _use(DIELECTRIC):
            sel = is_kind(DIELECTRIC)
            ior = jnp.where(sel & (w_par > 0.0), w_par, 1.5)
            eta = jnp.where(front, 1.0 / ior, ior)
            cos_t = jnp.minimum(-(ux * nx_ + uy * ny_ + uz * nz_), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = eta * sin_t > 1.0
            r0s = (1.0 - eta) / (1.0 + eta)
            r0s = r0s * r0s
            omc = 1.0 - cos_t
            omc2 = omc * omc
            rp = r0s + (1.0 - r0s) * omc2 * omc2 * omc
            choose = cannot | (rp > u2)
            # refract(u, n, eta): perp = eta (u + cos n); par = -sqrt(1-|perp|²) n
            px_ = eta * (ux + cos_t * nx_)
            py_ = eta * (uy + cos_t * ny_)
            pz_ = eta * (uz + cos_t * nz_)
            k = 1.0 - (px_ * px_ + py_ * py_ + pz_ * pz_)
            pos = k > 0.0
            rpar = jnp.where(pos, jnp.sqrt(jnp.where(pos, k, 1.0)), 0.0)
            fx = px_ - rpar * nx_
            fy = py_ - rpar * ny_
            fz = pz_ - rpar * nz_
            gx = jnp.where(choose, mx, fx)
            gy = jnp.where(choose, my, fy)
            gz = jnp.where(choose, mz, fz)
            gx, gy, gz = normalize3(gx, gy, gz)
            sdx = jnp.where(sel, gx, sdx)
            sdy = jnp.where(sel, gy, sdy)
            sdz = jnp.where(sel, gz, sdz)
            atr = jnp.where(sel, white_atten, atr)
            atg = jnp.where(sel, white_atten, atg)
            atb = jnp.where(sel, white_atten, atb)

        # ---- Phong metal (Path B METAL) ----
        if _use(PHONG_METAL):
            sel = is_kind(PHONG_METAL)
            pc = jnp.exp(
                jnp.log(jnp.maximum(u0, 1e-12)) / (jnp.maximum(w_par, 0.0) + 1.0)
            )
            ax, ay, az = normalize3(mx, my, mz)
            gx, gy, gz = frame_lobe(ax, ay, az, pc)
            sdx = jnp.where(sel, gx, sdx)
            sdy = jnp.where(sel, gy, sdy)
            sdz = jnp.where(sel, gz, sdz)

        # ---- Specular mirror (Path B) ----
        if _use(SPECULAR):
            sel = is_kind(SPECULAR)
            gx, gy, gz = normalize3(mx, my, mz)
            sdx = jnp.where(sel, gx, sdx)
            sdy = jnp.where(sel, gy, sdy)
            sdz = jnp.where(sel, gz, sdz)

        # ---- Coat (Path B: 5% specular else diffuse cosine lobe) ----
        if _use(COAT):
            sel = is_kind(COAT)
            spec = u2 < 0.05
            ccos = jnp.sqrt(jnp.maximum(0.0, 1.0 - u0))
            gx, gy, gz = frame_lobe(nx_, ny_, nz_, ccos)
            gx = jnp.where(spec, mx, gx)
            gy = jnp.where(spec, my, gy)
            gz = jnp.where(spec, mz, gz)
            sdx = jnp.where(sel, gx, sdx)
            sdy = jnp.where(sel, gy, sdy)
            sdz = jnp.where(sel, gz, sdz)
            specf = spec.astype(jnp.float32)
            atr = jnp.where(sel, specf + (1.0 - specf) * w_ar, atr)
            atg = jnp.where(sel, specf + (1.0 - specf) * w_ag, atg)
            atb = jnp.where(sel, specf + (1.0 - specf) * w_ab, atb)

        # ---- smallpt refraction (Path B REFRACTION) ----
        if _use(REFRACTION):
            sel = is_kind(REFRACTION)
            nt = jnp.where(sel & (w_par > 0.0), w_par, 1.5)
            nnt = jnp.where(front, 1.0 / nt, nt)
            ddn = ux * nx_ + uy * ny_ + uz * nz_
            cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
            tir = cos2t < 0.0
            cos_t = jnp.minimum(-ddn, 1.0)
            px_ = nnt * (ux + cos_t * nx_)
            py_ = nnt * (uy + cos_t * ny_)
            pz_ = nnt * (uz + cos_t * nz_)
            k = 1.0 - (px_ * px_ + py_ * py_ + pz_ * pz_)
            pos = k > 0.0
            rpar = jnp.where(pos, jnp.sqrt(jnp.where(pos, k, 1.0)), 0.0)
            tdx, tdy, tdz = normalize3(
                px_ - rpar * nx_, py_ - rpar * ny_, pz_ - rpar * nz_
            )
            r0s = ((nt - 1.0) / (nt + 1.0)) ** 2
            c1m = 1.0 - jnp.where(front, -ddn, tdx * nx_ + tdy * ny_ + tdz * nz_)
            c1m2 = c1m * c1m
            re = r0s + (1.0 - r0s) * c1m2 * c1m2 * c1m
            prob = 0.25 + 0.5 * re
            choose = tir | (u2 < prob)
            nmx, nmy, nmz = normalize3(mx, my, mz)
            gx = jnp.where(choose, nmx, tdx)
            gy = jnp.where(choose, nmy, tdy)
            gz = jnp.where(choose, nmz, tdz)
            sdx = jnp.where(sel, gx, sdx)
            sdy = jnp.where(sel, gy, sdy)
            sdz = jnp.where(sel, gz, sdz)
            w = jnp.where(
                tir, 1.0, jnp.where(choose, re / prob, (1.0 - re) / (1.0 - prob))
            )
            atr = jnp.where(sel, w_ar * w, atr)
            atg = jnp.where(sel, w_ag * w, atg)
            atb = jnp.where(sel, w_ab * w, atb)

        # ---- bookkeeping (integrator.trace parity) ----
        miss = alive & jnp.logical_not(valid)
        if sky:
            t_sky = 0.5 * (uy + 1.0)
            skyr = SKY_WHITE[0] + t_sky * (SKY_BLUE[0] - SKY_WHITE[0])
            skyg = SKY_WHITE[1] + t_sky * (SKY_BLUE[1] - SKY_WHITE[1])
            skyb = SKY_WHITE[2] + t_sky * (SKY_BLUE[2] - SKY_WHITE[2])
            missf = miss.astype(jnp.float32)
            rx = rx + missf * tpx * skyr
            ry = ry + missf * tpy * skyg
            rz = rz + missf * tpz * skyb

        if additive_emission:
            # Path B additive emission (zero rows for Path A materials).
            hitf = (alive & valid).astype(jnp.float32)
            rx = rx + hitf * tpx * w_er
            ry = ry + hitf * tpy * w_eg
            rz = rz + hitf * tpz * w_eb
        if _use(EMISSION):
            termf = (alive & valid & is_kind(EMISSION)).astype(jnp.float32)
            rx = rx + termf * tpx * w_ar * w_par
            ry = ry + termf * tpy * w_ag * w_par
            rz = rz + termf * tpz * w_ab * w_par

        cont = alive & valid & scattered
        contf = cont.astype(jnp.float32)
        ntpx = tpx * (1.0 - contf + contf * atr)
        ntpy = tpy * (1.0 - contf + contf * atg)
        ntpz = tpz * (1.0 - contf + contf * atb)

        if russian_roulette:
            p = jnp.clip(jnp.maximum(jnp.maximum(ntpx, ntpy), ntpz), 0.05, 1.0)
            survive = jnp.logical_not(do_rr) | (u3 < p)
            boost = cont & do_rr & survive
            bf = boost.astype(jnp.float32)
            inv_p = 1.0 / p
            ntpx = ntpx * (1.0 - bf + bf * inv_p)
            ntpy = ntpy * (1.0 - bf + bf * inv_p)
            ntpz = ntpz * (1.0 - bf + bf * inv_p)
            cont = cont & survive
            contf = cont.astype(jnp.float32)

        safe_t = jnp.where(valid, best_t, 0.0)
        return (
            jnp.where(cont, ox + safe_t * dx, ox),
            jnp.where(cont, oy + safe_t * dy, oy),
            jnp.where(cont, oz + safe_t * dz, oz),
            jnp.where(cont, sdx, dx),
            jnp.where(cont, sdy, dy),
            jnp.where(cont, sdz, dz),
            ntpx, ntpy, ntpz,
            rx, ry, rz,
            cont,
        )


def _bounce_kernel(
    do_rr_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref, alive_ref,
    u0_ref, u1_ref, u2_ref, u3_ref,
    tpx_ref, tpy_ref, tpz_ref, rx_ref, ry_ref, rz_ref,
    sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref, bvh_b_ref, bvh_m_ref,
    oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
    otpx_ref, otpy_ref, otpz_ref, orx_ref, ory_ref, orz_ref, oalive_ref,
    **consts,
):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tm = tm_ref[0]
    alive = alive_ref[0] != 0
    shape = ox.shape

    # Pass-through defaults (dead block: state is copied unchanged).
    oox_ref[0] = ox; ooy_ref[0] = oy; ooz_ref[0] = oz
    odx_ref[0] = dx; ody_ref[0] = dy; odz_ref[0] = dz
    otpx_ref[0] = tpx_ref[0]; otpy_ref[0] = tpy_ref[0]; otpz_ref[0] = tpz_ref[0]
    orx_ref[0] = rx_ref[0]; ory_ref[0] = ry_ref[0]; orz_ref[0] = rz_ref[0]
    oalive_ref[0] = jnp.zeros(shape, jnp.int32)

    @pl.when(jnp.any(alive))
    def _():
        out = _bounce_core(
            ox, oy, oz, dx, dy, dz, tm, alive,
            tpx_ref[0], tpy_ref[0], tpz_ref[0],
            rx_ref[0], ry_ref[0], rz_ref[0],
            u0_ref[0], u1_ref[0], u2_ref[0], u3_ref[0],
            do_rr_ref[0] != 0,
            sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref,
            bvh_b_ref, bvh_m_ref,
            **consts,
        )
        (oox_ref[0], ooy_ref[0], ooz_ref[0],
         odx_ref[0], ody_ref[0], odz_ref[0],
         otpx_ref[0], otpy_ref[0], otpz_ref[0],
         orx_ref[0], ory_ref[0], orz_ref[0]) = out[:12]
        oalive_ref[0] = out[12].astype(jnp.int32)


def _trace_sample(
    pid, b0, b1, ox, oy, oz, dx, dy, dz, tm, alive,
    sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref, bvh_b_ref, bvh_m_ref,
    *, bounces: int, rr_start: int, **consts,
):
    """Trace one wavefront sample to completion in-register.

    Wavefront state never leaves VMEM between bounces, per-bounce uniforms
    are pcg4d hashes of (pixel_id, key words, bounce) computed in-register
    (bit-identical to the XLA path's ops/rng.bounce_uniforms), and the loop
    exits as soon as every ray in the 1024-ray block has terminated —
    a per-block early-out instead of the scan's whole-wavefront consensus.

    All vector args are (rows, 128); pid/b0/b1 uint32. Returns (rx, ry, rz).
    """
    from raytracingthenextweekcuda_tpu.ops.rng import pcg4d, to_uniform

    shape = ox.shape
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    # The live mask is carried as i32: Mosaic cannot legalize a
    # vector<8x128xi1> while-loop carry.
    init = (jnp.int32(0), ox, oy, oz, dx, dy, dz,
            one, one, one, zero, zero, zero, alive.astype(jnp.int32))

    def cond(c):
        return (c[0] < bounces) & (jnp.max(c[13]) > 0)

    def body(c):
        (b, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz, rx, ry, rz, alive_i) = c
        cnt = jnp.full(shape, jnp.uint32(1), jnp.uint32) + b.astype(jnp.uint32)
        h0, h1, h2, h3 = pcg4d(pid, b0, cnt, b1)
        out = _bounce_core(
            ox, oy, oz, dx, dy, dz, tm, alive_i != 0,
            tpx, tpy, tpz, rx, ry, rz,
            to_uniform(h0), to_uniform(h1), to_uniform(h2), to_uniform(h3),
            b >= rr_start,
            sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref,
            bvh_b_ref, bvh_m_ref,
            **consts,
        )
        return (b + 1, *out[:12], out[12].astype(jnp.int32))

    final = jax.lax.while_loop(cond, body, init)
    return final[10], final[11], final[12]


def _path_kernel(
    base_ref,
    pid_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
    alive_ref,
    sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref, bvh_b_ref, bvh_m_ref,
    orx_ref, ory_ref, orz_ref,
    *, bounces: int, rr_start: int, **consts,
):
    """Whole-path megastep: the full bounce loop in ONE kernel."""
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tm = tm_ref[0]
    alive = alive_ref[0] != 0
    shape = ox.shape
    pid = pid_ref[0].astype(jnp.uint32)
    b0 = jnp.full(shape, base_ref[0].astype(jnp.uint32), jnp.uint32)
    b1 = jnp.full(shape, base_ref[1].astype(jnp.uint32), jnp.uint32)

    orx_ref[0], ory_ref[0], orz_ref[0] = _trace_sample(
        pid, b0, b1, ox, oy, oz, dx, dy, dz, tm, alive,
        sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref, bvh_b_ref, bvh_m_ref,
        bounces=bounces, rr_start=rr_start, **consts,
    )


def _raygen_core(pid, xs, ys, b0, b1, frame_ref, *, width: int, height: int):
    """In-register thin-lens ray generation (camera.generate_rays parity).

    Consumes the exact pcg4d stream of ops/rng.raygen_uniforms and the same
    arithmetic as models/camera.generate_rays, so the fused whole-render
    kernel and the XLA path produce identical primary rays. `frame_ref` is
    the 21-float SMEM camera frame packed by `_pack_frame`.

    Returns (ox, oy, oz, dx, dy, dz, tm), all (rows, 128) f32.
    """
    from raytracingthenextweekcuda_tpu.ops.rng import pcg4d, to_uniform

    shape = xs.shape
    # Python int literals of ops/rng.RAYGEN_DOMAIN/RAYGEN_DOMAIN2 (the jnp
    # module constants would be captured tracers inside a Pallas kernel).
    dom = jnp.full(shape, 0x9E3779B9, jnp.uint32)
    dom2 = jnp.full(shape, 0x85EBCA6B, jnp.uint32)
    h0, h1, h2, h3 = pcg4d(pid, b0, dom, b1)
    u0, u1, u2, u3 = (to_uniform(h0), to_uniform(h1),
                      to_uniform(h2), to_uniform(h3))
    t0h, _, _, _ = pcg4d(pid, b0, dom2, b1)
    u4 = to_uniform(t0h)

    f = lambda i: frame_ref[i]
    # Pixel sample placement dx=(x+u)/(width-1) (main.cu:179-183).
    dxs = (xs + u0) / (width - 1.0)
    dys = (ys + u1) / (height - 1.0)

    # Closed-form lens disk (Utils.h:96-104) scaled by lens radius.
    r = jnp.sqrt(u2)
    phi = 6.283185307179586 * u3
    disk_x = f(18) * r * jnp.cos(phi)
    disk_y = f(18) * r * jnp.sin(phi)

    ox = f(0) + disk_x * f(12) + disk_y * f(15)
    oy = f(1) + disk_x * f(13) + disk_y * f(16)
    oz = f(2) + disk_x * f(14) + disk_y * f(17)

    dx = f(3) + dxs * f(6) + dys * f(9) - ox
    dy = f(4) + dxs * f(7) + dys * f(10) - oy
    dz = f(5) + dxs * f(8) + dys * f(11) - oz
    # Safe normalize, same formula as ops/linalg.normalize (sqrt + divide).
    nsq = dx * dx + dy * dy + dz * dz
    pos = nsq > 0.0
    inv = jnp.where(pos, 1.0 / jnp.sqrt(jnp.where(pos, nsq, 1.0)), 0.0)
    tm = u4 * (f(20) - f(19)) + f(19)
    return ox, oy, oz, dx * inv, dy * inv, dz * inv, tm


def _render_kernel(
    bases_ref, frame_ref,
    pid_ref, xs_ref, ys_ref, alive_ref,
    sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref, bvh_b_ref, bvh_m_ref,
    orx_ref, ory_ref, orz_ref,
    *, n_samples: int, width: int, height: int,
    bounces: int, rr_start: int, **consts,
):
    """Whole-RENDER megastep: raygen + ALL spp + ALL bounces in ONE kernel.

    The spp loop moves inside the kernel: per 1024-ray block, a fori_loop
    over samples generates the thin-lens primary ray in-register
    (_raygen_core) and traces it to completion (_trace_sample), accumulating
    radiance in VMEM. HBM traffic for an entire render pass = read pixel
    ids/coords once + write 3 radiance planes once — per-sample wavefront
    state NEVER touches HBM. This removed the former per-sample raygen
    dispatch (1.77 ms of a 2.72 ms/sample render: (N, 3) vector math
    lane-pads 42x on TPU).

    bases_ref: SMEM (2, S) int32 — per-sample jax.random key words, so the
    RNG stream is exactly the XLA path's (split(key, S) then per-ray pcg4d).
    """
    pid = pid_ref[0].astype(jnp.uint32)
    xs = xs_ref[0]
    ys = ys_ref[0]
    alive0 = alive_ref[0] != 0
    shape = xs.shape
    zero = jnp.zeros(shape, jnp.float32)

    def sample_body(s, acc):
        arx, ary, arz = acc
        b0 = jnp.full(shape, bases_ref[0, s].astype(jnp.uint32), jnp.uint32)
        b1 = jnp.full(shape, bases_ref[1, s].astype(jnp.uint32), jnp.uint32)
        ox, oy, oz, dx, dy, dz, tm = _raygen_core(
            pid, xs, ys, b0, b1, frame_ref, width=width, height=height,
        )
        rx, ry, rz = _trace_sample(
            pid, b0, b1, ox, oy, oz, dx, dy, dz, tm, alive0,
            sph_ref, pla_ref, tri_ref, trih_ref, quad_ref, box_ref,
            bvh_b_ref, bvh_m_ref,
            bounces=bounces, rr_start=rr_start, **consts,
        )
        return (arx + rx, ary + ry, arz + rz)

    rx, ry, rz = jax.lax.fori_loop(
        0, n_samples, sample_body, (zero, zero, zero)
    )
    orx_ref[0] = rx
    ory_ref[0] = ry
    orz_ref[0] = rz


@functools.partial(
    jax.jit,
    static_argnames=("counts", "hcounts", "base_rows", "n_bvh_nodes", "leaf_tile", "tmin",
                     "backface_cull", "sky", "used_kinds",
                     "russian_roulette", "additive_emission", "interpret"),
)
def _run_bounce(ray_state, u4, do_rr, packed_arrays, counts, hcounts,
                base_rows, n_bvh_nodes, tmin, backface_cull, sky, used_kinds,
                russian_roulette, additive_emission, interpret,
                leaf_tile=128):
    (ox, oy, oz, dx, dy, dz, tm, alive, tpx, tpy, tpz, rx, ry, rz) = ray_state
    sph, pla, tri, trih, quad, box, bvh_b, bvh_m = packed_arrays
    n = ox.shape[0]
    n_blocks = n // RAY_BLOCK
    rows = RAY_BLOCK // 128

    def rs(a):
        return a.reshape(n_blocks, rows, 128)

    kern = functools.partial(
        _bounce_kernel,
        n_sph=counts[0], n_pla=counts[1], n_tri=counts[2],
        n_trih=hcounts[0], n_quad=hcounts[1], n_box=hcounts[2],
        n_bvh_nodes=n_bvh_nodes,
        tmin=tmin, backface_cull=backface_cull, sky=sky,
        used_kinds=used_kinds, russian_roulette=russian_roulette,
        additive_emission=additive_emission,
        sb=base_rows[0], pb=base_rows[1], tb=base_rows[2],
        leaf_tile=leaf_tile,
    )
    ray_spec = pl.BlockSpec(
        (1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # The brute path reads tri/trih one scalar at a time (SMEM); the
    # traversal path streams trih leaf tiles 128-wide via pl.ds (VMEM —
    # SMEM allows only scalar loads, the r02 on-hardware failure mode)
    # while tri is a 1-column dummy that stays scalar-addressed.
    trih_spec = pl.BlockSpec(
        memory_space=pltpu.VMEM if n_bvh_nodes else pltpu.SMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=(
            [smem_spec] + [ray_spec] * 18
            + [smem_spec, smem_spec, smem_spec, trih_spec, smem_spec,
               smem_spec, smem_spec, smem_spec]
        ),
        out_specs=[ray_spec] * 13,
        out_shape=(
            [jax.ShapeDtypeStruct((n_blocks, rows, 128), jnp.float32)] * 12
            + [jax.ShapeDtypeStruct((n_blocks, rows, 128), jnp.int32)]
        ),
        interpret=interpret,
    )(
        do_rr,
        rs(ox), rs(oy), rs(oz), rs(dx), rs(dy), rs(dz), rs(tm),
        rs(alive),
        rs(u4[:, 0]), rs(u4[:, 1]), rs(u4[:, 2]), rs(u4[:, 3]),
        rs(tpx), rs(tpy), rs(tpz), rs(rx), rs(ry), rs(rz),
        sph, pla, tri, trih, quad, box, bvh_b, bvh_m,
    )
    return tuple(o.reshape(n) for o in outs)


@functools.partial(
    jax.jit,
    static_argnames=("counts", "hcounts", "base_rows", "n_bvh_nodes", "leaf_tile", "tmin",
                     "backface_cull", "sky", "used_kinds",
                     "russian_roulette", "additive_emission",
                     "bounces", "rr_start", "interpret"),
)
def _run_path(pid, ox, oy, oz, dx, dy, dz, tmv, alive, bases,
              packed_arrays, counts, hcounts, base_rows, n_bvh_nodes, tmin,
              backface_cull, sky, used_kinds, russian_roulette,
              additive_emission, bounces, rr_start, interpret,
              leaf_tile=128):
    sph, pla, tri, trih, quad, box, bvh_b, bvh_m = packed_arrays
    n = ox.shape[0]
    n_blocks = n // RAY_BLOCK
    rows = RAY_BLOCK // 128

    def rs(a):
        return a.reshape(n_blocks, rows, 128)

    kern = functools.partial(
        _path_kernel,
        bounces=bounces, rr_start=rr_start,
        n_sph=counts[0], n_pla=counts[1], n_tri=counts[2],
        n_trih=hcounts[0], n_quad=hcounts[1], n_box=hcounts[2],
        n_bvh_nodes=n_bvh_nodes,
        tmin=tmin, backface_cull=backface_cull, sky=sky,
        used_kinds=used_kinds, russian_roulette=russian_roulette,
        additive_emission=additive_emission,
        sb=base_rows[0], pb=base_rows[1], tb=base_rows[2],
        leaf_tile=leaf_tile,
    )
    ray_spec = pl.BlockSpec(
        (1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    trih_spec = pl.BlockSpec(
        memory_space=pltpu.VMEM if n_bvh_nodes else pltpu.SMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=(
            [smem_spec] + [ray_spec] * 9
            + [smem_spec, smem_spec, smem_spec, trih_spec, smem_spec,
               smem_spec, smem_spec, smem_spec]
        ),
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((n_blocks, rows, 128), jnp.float32)] * 3,
        interpret=interpret,
    )(
        bases,
        rs(pid), rs(ox), rs(oy), rs(oz), rs(dx), rs(dy), rs(dz), rs(tmv),
        rs(alive),
        sph, pla, tri, trih, quad, box, bvh_b, bvh_m,
    )
    return tuple(o.reshape(n) for o in outs)


@functools.partial(
    jax.jit,
    static_argnames=("counts", "hcounts", "base_rows", "n_bvh_nodes", "leaf_tile",
                     "n_samples",
                     "width", "height", "tmin", "backface_cull", "sky",
                     "used_kinds", "russian_roulette", "additive_emission",
                     "bounces", "rr_start", "interpret"),
)
def _run_render(pid, xs, ys, alive, bases, frame, packed_arrays, counts,
                hcounts, base_rows, n_bvh_nodes, n_samples, width, height,
                tmin, backface_cull, sky, used_kinds, russian_roulette,
                additive_emission, bounces, rr_start, interpret,
                leaf_tile=128):
    sph, pla, tri, trih, quad, box, bvh_b, bvh_m = packed_arrays
    n = pid.shape[0]
    n_blocks = n // RAY_BLOCK
    rows = RAY_BLOCK // 128

    def rs(a):
        return a.reshape(n_blocks, rows, 128)

    kern = functools.partial(
        _render_kernel,
        n_samples=n_samples, width=width, height=height,
        bounces=bounces, rr_start=rr_start,
        n_sph=counts[0], n_pla=counts[1], n_tri=counts[2],
        n_trih=hcounts[0], n_quad=hcounts[1], n_box=hcounts[2],
        n_bvh_nodes=n_bvh_nodes,
        tmin=tmin, backface_cull=backface_cull, sky=sky,
        used_kinds=used_kinds, russian_roulette=russian_roulette,
        additive_emission=additive_emission,
        sb=base_rows[0], pb=base_rows[1], tb=base_rows[2],
        leaf_tile=leaf_tile,
    )
    ray_spec = pl.BlockSpec(
        (1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    trih_spec = pl.BlockSpec(
        memory_space=pltpu.VMEM if n_bvh_nodes else pltpu.SMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=(
            [smem_spec, smem_spec] + [ray_spec] * 4
            + [smem_spec, smem_spec, smem_spec, trih_spec, smem_spec,
               smem_spec, smem_spec, smem_spec]
        ),
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((n_blocks, rows, 128), jnp.float32)] * 3,
        interpret=interpret,
    )(
        bases, frame,
        rs(pid), rs(xs), rs(ys), rs(alive),
        sph, pla, tri, trih, quad, box, bvh_b, bvh_m,
    )
    return tuple(o.reshape(n) for o in outs)


def _pack_frame(frame) -> jnp.ndarray:
    """CameraFrame -> the 21-float SMEM layout _raygen_core reads."""
    return jnp.concatenate([
        jnp.asarray(frame.origin, jnp.float32).reshape(3),
        jnp.asarray(frame.lower_left, jnp.float32).reshape(3),
        jnp.asarray(frame.horizontal, jnp.float32).reshape(3),
        jnp.asarray(frame.vertical, jnp.float32).reshape(3),
        jnp.asarray(frame.right, jnp.float32).reshape(3),
        jnp.asarray(frame.true_up, jnp.float32).reshape(3),
        jnp.asarray(frame.lens_radius, jnp.float32).reshape(1),
        jnp.asarray(frame.time0, jnp.float32).reshape(1),
        jnp.asarray(frame.time1, jnp.float32).reshape(1),
    ])


def _scene_arrays(packed_shaded):
    """(sph, pla, tri, trih, quad, box, bvh_b, bvh_m) with dummies for
    absent parts, plus static (n_bvh_nodes, hcounts)."""
    bvh_b = packed_shaded.bvh_bounds
    bvh_m = packed_shaded.bvh_meta
    n_bvh_nodes = 0 if bvh_b is None else int(bvh_b.shape[1])
    if bvh_b is None:
        bvh_b = jnp.zeros((6, 1), jnp.float32)
        bvh_m = jnp.zeros((5, 1), jnp.int32)
    trih = packed_shaded.trih
    quadh = packed_shaded.quadh
    boxh = getattr(packed_shaded, "boxh", None)
    hcounts = tuple(packed_shaded.hcounts)
    if len(hcounts) == 2:  # packs predating the box merge
        hcounts = hcounts + (0,)
    if trih is None:
        trih = jnp.zeros((HAVEL_ROWS + MAT_ROWS, 1), jnp.float32)
        quadh = jnp.zeros((HAVEL_ROWS + MAT_ROWS, 1), jnp.float32)
        hcounts = (0, 0, 0)
    if boxh is None:
        boxh = jnp.zeros((BOX_ROWS + MAT_ROWS, 1), jnp.float32)
        hcounts = (hcounts[0], hcounts[1], 0)
    triangles = packed_shaded.triangles
    if n_bvh_nodes:
        # The traversal reads Havel leaf tiles (trih); the Möller–Trumbore
        # base rows are unused in-kernel — pass a 1-column dummy so they
        # don't occupy SMEM/VMEM or HBM bandwidth.
        triangles = triangles[:, :1]
    arrays = (packed_shaded.spheres, packed_shaded.planes,
              triangles, trih, quadh, boxh, bvh_b, bvh_m)
    # Static leaf tile width of the consensus-traversal path (wide leaves
    # are visited in 128-wide chunks inside the kernel).
    lt = getattr(packed_shaded, "leaf_tiles", None)
    leaf_tile = (int(packed_shaded.trih.shape[1] // lt.shape[1])
                 if n_bvh_nodes and lt is not None else 128)
    return arrays, n_bvh_nodes, hcounts, leaf_tile


def render_samples(scene, packed_shaded, frame, sample_keys, cfg,
                   pixel_ids=None, interpret=False) -> jnp.ndarray:
    """Render `len(sample_keys)` spp in ONE kernel dispatch.

    The production render path: raygen + the full bounce loop for every
    sample run per 1024-ray VMEM block inside a single Pallas kernel
    (_render_kernel). `frame` is a camera.CameraFrame; `sample_keys` the
    (S,)-batched jax.random keys of render_pass (one per sample, identical
    stream to the XLA path). Returns summed radiance (N, 3).
    """
    n = cfg.num_pixels if pixel_ids is None else pixel_ids.shape[0]
    if pixel_ids is None:
        pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    n_pad = ((n + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK

    def pad(a, val=0):
        return jnp.pad(a, (0, n_pad - n), constant_values=val) \
            if n_pad != n else a

    base_rows = (
        packed_shaded.spheres.shape[0] - MAT_ROWS,
        packed_shaded.planes.shape[0] - MAT_ROWS,
        packed_shaded.triangles.shape[0] - MAT_ROWS,
    )
    scene_arrays, n_bvh_nodes, hcounts, leaf_tile = _scene_arrays(packed_shaded)

    pid = pad(pixel_ids).astype(jnp.int32)
    xs = (pixel_ids % cfg.width).astype(jnp.float32)
    ys = (pixel_ids // cfg.width).astype(jnp.float32)
    alive = pad(jnp.ones((n,), jnp.int32))
    # (2, S) per-sample key words; int32 for SMEM.
    kd = jax.random.key_data(sample_keys)
    bases = jnp.stack(
        [kd[..., 0].astype(jnp.uint32), kd[..., 1].astype(jnp.uint32)]
    ).astype(jnp.int32)
    n_samples = int(bases.shape[1])

    frame_vec, arrays = _forward_only((_pack_frame(frame), scene_arrays))
    rx, ry, rz = _run_render(
        pid, pad(xs), pad(ys), alive, bases, frame_vec,
        arrays,
        packed_shaded.counts, hcounts, base_rows, n_bvh_nodes, n_samples,
        int(cfg.width), int(cfg.height), float(cfg.tmin),
        True, bool(cfg.sky_background), packed_shaded.used_kinds,
        bool(cfg.russian_roulette),
        bool(getattr(packed_shaded, "has_emission", True)),
        int(cfg.bounces), int(cfg.rr_start_bounce), bool(interpret),
        leaf_tile=leaf_tile,
    )
    return jnp.stack([rx[:n], ry[:n], rz[:n]], axis=-1)


def path_trace(scene, packed_shaded, rays, ctx, cfg, interpret=False):
    """Trace a whole wavefront to completion in ONE kernel dispatch.

    Returns radiance (N, 3). `ctx` is the ops/rng.RayCtx from
    camera.generate_rays — the kernel regenerates each bounce's uniforms
    in-register from it, consuming the exact stream the XLA path does.
    """
    n = rays.count
    n_pad = ((n + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK

    def pad(a, val=0):
        return jnp.pad(a, (0, n_pad - n), constant_values=val) \
            if n_pad != n else a

    base_rows = (
        packed_shaded.spheres.shape[0] - MAT_ROWS,
        packed_shaded.planes.shape[0] - MAT_ROWS,
        packed_shaded.triangles.shape[0] - MAT_ROWS,
    )
    scene_arrays, n_bvh_nodes, hcounts, leaf_tile = _scene_arrays(packed_shaded)

    pid = pad(ctx.pixel_id).astype(jnp.int32)
    alive = pad(jnp.ones((n,), jnp.int32))
    assert ctx.base0.ndim == 0 and ctx.base1.ndim == 0, (
        "path_trace needs scalar RayCtx key words (one sample per "
        "wavefront); multi-sample (N,) contexts go through the sorted "
        "XLA path (models.integrator._trace_sorted)"
    )
    bases = jnp.stack(
        [ctx.base0.astype(jnp.int32), ctx.base1.astype(jnp.int32)]
    )

    inputs, arrays = _forward_only(
        ((pad(rays.origin[:, 0]), pad(rays.origin[:, 1]),
          pad(rays.origin[:, 2]),
          pad(rays.direction[:, 0]), pad(rays.direction[:, 1]),
          pad(rays.direction[:, 2]), pad(rays.time)),
         scene_arrays)
    )
    ox, oy, oz, dx, dy, dz, tmv = inputs
    rx, ry, rz = _run_path(
        pid, ox, oy, oz, dx, dy, dz, tmv, alive, bases,
        arrays,
        packed_shaded.counts, hcounts, base_rows, n_bvh_nodes, float(cfg.tmin),
        True, bool(cfg.sky_background), packed_shaded.used_kinds,
        bool(cfg.russian_roulette),
        bool(getattr(packed_shaded, "has_emission", True)),
        int(cfg.bounces), int(cfg.rr_start_bounce), bool(interpret),
        leaf_tile=leaf_tile,
    )
    return jnp.stack([rx[:n], ry[:n], rz[:n]], axis=-1)


@jax.custom_vjp
def _forward_only(tree):
    """Identity that FAILS LOUDLY under reverse-mode AD.

    A plain stop_gradient here would silently return zero gradients to
    anyone differentiating a fused-bounce render; this raises instead,
    pointing at cfg.fused_bounce=False (the XLA wavefront path).
    """
    return tree


def _forward_only_fwd(tree):
    return tree, None


def _forward_only_bwd(_, ct):
    raise NotImplementedError(
        "cfg.fused_bounce=True renders with the forward-only Pallas bounce "
        "megastep; set fused_bounce=False for differentiable rendering "
        "(the XLA wavefront path)."
    )


_forward_only.defvjp(_forward_only_fwd, _forward_only_bwd)


def planar_state(rays):
    """Split a Rays wavefront into the kernel's planar (N_pad,) carry tuple.

    TPU lane-pads the minor dim of (N, 3) arrays to 128, so wavefront state
    crossing HBM as (N, 3) wastes bandwidth; the bounce scan therefore
    carries 14 flat (N_pad,) arrays (RAY_BLOCK-padded) and the caller stacks
    radiance back only once per sample.

    Returns (ox, oy, oz, dx, dy, dz, tm, alive, tpx, tpy, tpz, rx, ry, rz).
    """
    n = rays.count
    n_pad = ((n + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK

    def pad(a):
        return jnp.pad(a, (0, n_pad - n)) if n_pad != n else a

    zeros = jnp.zeros((n_pad,), rays.origin.dtype)
    ones = jnp.ones((n_pad,), rays.origin.dtype)
    alive = jnp.pad(jnp.ones((n,), jnp.int32), (0, n_pad - n)) \
        if n_pad != n else jnp.ones((n,), jnp.int32)
    return (
        pad(rays.origin[:, 0]), pad(rays.origin[:, 1]), pad(rays.origin[:, 2]),
        pad(rays.direction[:, 0]), pad(rays.direction[:, 1]),
        pad(rays.direction[:, 2]),
        pad(rays.time),
        alive,
        ones, ones, ones,                   # throughput
        zeros, zeros, zeros,                # radiance
    )


def bounce_step(scene, packed_shaded, state, u4, do_rr, cfg, interpret=False):
    """One fused bounce over the planar carry from `planar_state`.

    `state` = (ox, oy, oz, dx, dy, dz, tm, alive, tpx, tpy, tpz, rx, ry, rz),
    all (N_pad,). Returns the same tuple advanced one bounce. `u4` is the
    (N, 4) per-bounce uniform block (same stream as the XLA path); `do_rr`
    a scalar int32 (Russian roulette active this bounce).
    """
    n_pad = state[0].shape[0]
    if u4.shape[0] != n_pad:
        u4 = jnp.pad(u4, ((0, n_pad - u4.shape[0]), (0, 0)))
    base_rows = (
        packed_shaded.spheres.shape[0] - MAT_ROWS,
        packed_shaded.planes.shape[0] - MAT_ROWS,
        packed_shaded.triangles.shape[0] - MAT_ROWS,
    )
    scene_arrays, n_bvh_nodes, hcounts, leaf_tile = _scene_arrays(packed_shaded)
    state, u4, arrays = _forward_only((state, u4, scene_arrays))
    tm = state[6]
    outs = _run_bounce(
        state,
        u4,
        jnp.asarray([do_rr], jnp.int32),
        arrays,
        packed_shaded.counts, hcounts, base_rows, n_bvh_nodes, float(cfg.tmin),
        True, bool(cfg.sky_background), packed_shaded.used_kinds,
        bool(cfg.russian_roulette),
        bool(getattr(packed_shaded, "has_emission", True)),
        bool(interpret),
        leaf_tile=leaf_tile,
    )
    (ox, oy, oz, dx, dy, dz, tpx, tpy, tpz, rx, ry, rz, alive_i) = outs
    return (ox, oy, oz, dx, dy, dz, tm, alive_i,
            tpx, tpy, tpz, rx, ry, rz)


__all__ = ["bounce_step", "path_trace", "planar_state", "pack_scene_shaded",
           "render_samples", "MAT_ROWS"]
