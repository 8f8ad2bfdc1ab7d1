"""Tile-BVH winner kernel driven by an XLA-precomputed leaf work list.

The TPU-native answer to the reference's per-thread stack traversal
(CUDAPathTracer.cu:192-352). Round 2's in-kernel block-consensus tree walk
(ops/pallas/bounce_kernel.py, n_bvh_nodes path) spends most of its time in
scalar control flow: a while_loop over ~2L tree nodes per 1024-ray block,
per-row lax.conds at every leaf, then a SECOND whole-tree sweep to resolve
winner attributes. Profiled on a v5e at 256x256 over a 16k-tri mesh, that
kernel runs ~90-120 ms/bounce while its leaf math alone is tens of Gflop —
overhead-bound, not compute-bound.

This module inverts the control flow, the standard XLA move: decide the
data-dependent part OUTSIDE the kernel, feed the kernel a dense work list.

  1. `build_worklist` (pure XLA, vectorized): slab-test every ray against
     every LEAF AABB, reduce to a per-block (hit-any, nearest-tn) per
     leaf, and argsort leaves per block by entry distance. Output: a
     compact front-to-back leaf list + count per block.
  2. `_winner_kernel` (Pallas): per block, while_loop over ITS OWN leaf
     list (lengths from SMEM), terminating at the OCCLUSION HORIZON: the
     sorted entry distances are compared against the block's search
     ceiling (the analytic-occlusion t_cap capped by each ray's root-box
     exit, reduced ONCE per block — a static ceiling; dynamic per-eval
     re-tightening from mesh best_t was a measured net loss, each update
     costing a cross-lane max + vector->scalar sync), so the walk stops
     once no remaining leaf can improve any ray — the wavefront analogue
     of the reference's closest-hit distance pruning
     (CUDAPathTracer.cu:332-345). The same ceiling also filters the list
     AT BUILD TIME (build_worklist tcap). Each listed leaf is
     additionally slab-RE-checked against the live best_t and, if any
     ray can still improve, one vectorized (ROWS, 128, tile) Havel tile
     evaluation updates (best_t, winner code). No tree walk, no per-row
     conds, no attribute resolution: the kernel returns (t, code) only,
     code = global padded-triangle column.
  3. Attributes/normals are gathered OUTSIDE by ops/fused.py's
     differentiable recompute — which makes this path the one that serves
     BOTH production forward rendering and inverse rendering on meshes
     (stop-gradient the selection, differentiate the recompute; the same
     fixed-topology rule as ops/traverse.py, at kernel speed).

Reference parity: leaf test is the precomputed plane + edge-plane (Havel)
form the reference bakes per triangle (Loader.cpp:189-201, consumed
CUDAPathTracer.cu:294-326); front-to-back pruning mirrors its
closest-hit-so-far distance test (CUDAPathTracer.cu:332-345).

(An MXU formulation of the leaf test — t/u/v as two K=4 matmuls — was
measured SLOWER than the elementwise VPU chain on a v5e: 60.5 vs 46.5 ms
on primaries, 515 vs 218 ms on a shuffled wavefront. The K=4 dots pay 32x
K-padding on the MXU plus HIGHEST-precision passes, and the (B,1)-column
carry ops run at 1/128 lane utilization. Removed; see git history.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingthenextweekcuda_tpu.config import EPSILON, FLT_EPSILON
from raytracingthenextweekcuda_tpu.ops.pallas.intersect_kernel import (
    BIG,
    RAY_BLOCK,
    TYPE_TRIANGLE,
)

_LANE_MAX = 2**30

# Work-list builder processes rays in chunks of this many blocks to bound
# the (rays, leaves) slab temporaries (128 blocks x 1024 rays x 512 leaves
# x 4 B = 268 MB per temp at the cap).
_WL_CHUNK_BLOCKS = 128

# Exact per-ray work-list build is O(rays x leaves); above this leaf count
# the conservative packet-frustum build (O(blocks x leaves), supersets
# rejected per-ray by the kernel's slab prune) takes over.
FRUSTUM_LEAF_THRESHOLD = 2048


def use_frustum_worklist(n_leaves: int) -> bool:
    """Resolve the work-list builder choice for a leaf count: the exact
    per-ray pass is O(rays x leaves) — above FRUSTUM_LEAF_THRESHOLD the
    conservative packet-frustum pass (O(blocks x leaves)) takes over.
    RTNW_WL_FRUSTUM=1/0 forces it on/off."""
    import os

    env = os.environ.get("RTNW_WL_FRUSTUM", "")
    return env == "1" or (env != "0" and n_leaves > FRUSTUM_LEAF_THRESHOLD)


@functools.partial(
    jax.jit, static_argnames=("tmin", "block", "interpret", "frustum")
)
def build_worklist(ox, oy, oz, dx, dy, dz, alive, leaf_bounds, tmin,
                   block=RAY_BLOCK, interpret=False, frustum=False,
                   tcap=None):
    """Per-block front-to-back leaf work lists (pure XLA).

    ox..dz, alive: (N,) planar rays, N a `block` multiple (pre-padded).
    leaf_bounds: (6, L) f32 leaf AABBs.
    Returns (counts (B,1,1) i32, order (B,1,L) i32, entry (B,1,L) f32):
    for block b, the leaf ids order[b,0,:counts[b]] sorted by nearest slab
    entry distance over the block's live rays, entry the matching sorted
    distances (+inf past counts[b]).

    `block` is the consensus granularity in rays (a multiple of 128):
    smaller blocks over-include fewer leaves per ray (the block's spatial
    footprint shrinks) at the cost of more work-list rows. (A Pallas
    formulation of the slab pass with leaves on sublanes was measured
    SLOWER than this fused XLA pass — the per-op (Lpad,1)x(1,128)
    broadcast relayouts cost more than XLA's HBM temps.)

    `frustum=True` selects the conservative packet-frustum pass
    (_build_worklist_frustum): O(blocks x leaves) build instead of
    O(rays x leaves), lists are supersets of the exact hit union, and the
    winner kernel's per-ray slab prune rejects the extras — the final
    image is identical. Callers resolve the choice with
    use_frustum_worklist(n_leaves).
    """
    n = ox.shape[0]
    n_blocks = n // block
    L = leaf_bounds.shape[1]
    lo = leaf_bounds[0:3]  # (3, L)
    hi = leaf_bounds[3:6]

    eps = 1e-20

    def safe_inv(d):
        return 1.0 / jnp.where(
            jnp.abs(d) < eps, jnp.where(d >= 0.0, eps, -eps), d
        )

    if tcap is None:
        tcap = jnp.full((n,), jnp.float32(BIG))
    if frustum:
        return _build_worklist_frustum(
            ox, oy, oz, dx, dy, dz, alive, leaf_bounds, tmin, block,
            tcap=tcap)

    def chunk_fn(args):
        o3, d3, av, tc = args  # (C, 3), (C, 3), (C,), (C,)
        tn = jnp.full((o3.shape[0], L), -jnp.inf, jnp.float32)
        tf = jnp.full((o3.shape[0], L), jnp.inf, jnp.float32)
        for a in range(3):
            inv = safe_inv(d3[:, a])[:, None]          # (C, 1)
            t0 = (lo[a][None, :] - o3[:, a][:, None]) * inv
            t1 = (hi[a][None, :] - o3[:, a][:, None]) * inv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        # tcap: per-ray analytic-occlusion ceiling (the kernel seeds
        # best_t with it) — a leaf entered only BEHIND a ray's ceiling
        # (tn > tcap) cannot yield a winning t < tcap for that ray, so it
        # needn't be listed on the ray's account. Shifts the kernel's
        # per-leaf occlusion skips into this wide vector pass: fewer walk
        # iterations (each costs a scalar sync for the eval cond).
        hit = (tf >= tn) & (tf >= tmin) & (tn <= tc[:, None]) & av[:, None]
        tnm = jnp.where(hit, tn, jnp.inf)
        c_blocks = o3.shape[0] // block
        hitb = hit.reshape(c_blocks, block, L).any(axis=1)
        tnb = tnm.reshape(c_blocks, block, L).min(axis=1)
        return hitb, tnb

    o3 = jnp.stack([ox, oy, oz], axis=-1)
    d3 = jnp.stack([dx, dy, dz], axis=-1)
    av = alive != 0
    # Chunk so the (rays, leaves) slab temporaries stay bounded regardless
    # of the block granularity.
    chunk_blocks = max(1, (_WL_CHUNK_BLOCKS * RAY_BLOCK) // block)
    if n_blocks <= chunk_blocks:
        hitb, tnb = chunk_fn((o3, d3, av, tcap))
    else:
        # Pad the block count to a chunk multiple, map over chunks.
        n_chunks = -(-n_blocks // chunk_blocks)
        pad_blocks = n_chunks * chunk_blocks - n_blocks
        pad_n = pad_blocks * block

        def padc(a, shape_tail):
            return jnp.concatenate(
                [a, jnp.zeros((pad_n, *shape_tail), a.dtype)]
            ) if pad_n else a

        o3p = padc(o3, (3,)).reshape(n_chunks, -1, 3)
        d3p = padc(d3, (3,)).reshape(n_chunks, -1, 3)
        avp = padc(av, ()).reshape(n_chunks, -1)
        tcp = padc(tcap, ()).reshape(n_chunks, -1)
        hitb, tnb = jax.lax.map(chunk_fn, (o3p, d3p, avp, tcp))
        hitb = hitb.reshape(-1, L)[:n_blocks]
        tnb = tnb.reshape(-1, L)[:n_blocks]

    key = jnp.where(hitb, tnb, jnp.inf)
    entry, order = jax.lax.sort(
        (key, jax.lax.broadcasted_iota(jnp.int32, (n_blocks, L), 1)),
        num_keys=1,
    )
    counts = hitb.sum(axis=1).astype(jnp.int32)
    return (counts[:, None, None], order[:, None, :], entry[:, None, :])


def _winner_kernel(
    cnt_ref, wl_ref, entry_ref, root_ref, lb_ref, lt_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, alive_ref, tcap_ref,
    trih_ref,
    t_ref, code_ref, *rest,
    tmin: float, backface_cull: bool, tile: int, prune: bool,
    rows: int, sub: int,
    stats: bool = False, stream: bool = False,
):
    """One grid step serves `sub` consecutive ray blocks, each with its
    OWN 128-ray-granular work list, walked sequentially. Tight per-block
    lists keep the walk short (the round-4 block-size sweeps showed
    128-ray consensus wins), while batching amortizes the per-grid-step
    fixed cost (pipeline prologue + block fetch), which dominates when
    lists are short — measured ~4-6 us/step vs ~1-2 us of useful eval on
    the 46k-tri stress scene's primary bounce."""
    # Trailing refs: [stats out] + [trih VMEM double-buffer, DMA sems]
    # (outputs come before scratch in the pallas calling convention).
    idx = 0
    stats_ref = None
    if stats:
        stats_ref = rest[idx]
        idx += 1
    if stream:
        trih_buf_ref, dma_sem = rest[idx], rest[idx + 1]

    for s in range(sub):
        _winner_sub(
            cnt_ref, wl_ref, entry_ref, root_ref, lb_ref, lt_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, alive_ref,
            tcap_ref, trih_ref, t_ref, code_ref, stats_ref,
            trih_buf_ref if stream else None,
            dma_sem if stream else None,
            s=s, rows=rows, tmin=tmin, backface_cull=backface_cull,
            tile=tile, prune=prune, stream=stream,
        )


def _winner_sub(
    cnt_ref, wl_ref, entry_ref, root_ref, lb_ref, lt_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, alive_ref, tcap_ref,
    trih_ref, t_ref, code_ref, stats_ref, trih_buf_ref, dma_sem,
    *, s: int, rows: int, tmin: float, backface_cull: bool, tile: int,
    prune: bool, stream: bool,
):
    r0, r1 = s * rows, (s + 1) * rows
    ox, oy, oz = ox_ref[0, r0:r1], oy_ref[0, r0:r1], oz_ref[0, r0:r1]
    dx, dy, dz = dx_ref[0, r0:r1], dy_ref[0, r0:r1], dz_ref[0, r0:r1]
    alive = alive_ref[0, r0:r1] != 0
    shape = ox.shape  # (rows, 128)
    count = cnt_ref[0, s, 0]
    if stats_ref is not None:
        stats_ref[0, s, 0] = 0
        stats_ref[0, s, 1] = 0

    t_ref[0, r0:r1] = jnp.full(shape, BIG, jnp.float32)
    code_ref[0, r0:r1] = jnp.full(shape, -1, jnp.int32)

    @pl.when(jnp.any(alive) & (count > 0))
    def _():
        eps = 1e-20
        sdx = jnp.where(jnp.abs(dx) < eps,
                        jnp.where(dx >= 0.0, eps, -eps), dx)
        sdy = jnp.where(jnp.abs(dy) < eps,
                        jnp.where(dy >= 0.0, eps, -eps), dy)
        sdz = jnp.where(jnp.abs(dz) < eps,
                        jnp.where(dz >= 0.0, eps, -eps), dz)
        inv_dx, inv_dy, inv_dz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (shape[0], shape[1], tile), 2
        )
        o1 = lambda v: v[..., None]
        oxe, oye, oze = o1(ox), o1(oy), o1(oz)
        dxe, dye, dze = o1(dx), o1(dy), o1(dz)
        n_list = wl_ref.shape[2]

        # Per-ray search ceiling: the closest ANALYTIC hit (tcap — a leaf
        # behind the wall this ray already hit can never win) capped by
        # the ray's ROOT-BOX EXIT distance (every leaf box lies inside
        # the root box, so a ray's leaf-slab interval is contained in its
        # root interval; nothing can hit past the root exit). tcap seeds
        # best_t, so the per-leaf slab prune also rejects leaves behind
        # analytic hits; the root exit joins only the horizon (with a
        # small safety margin for fp slack) so rays that cross the root
        # box hitting nothing no longer pin the horizon at BIG.
        t0a = (root_ref[0, 0] - ox) * inv_dx
        t1a = (root_ref[3, 0] - ox) * inv_dx
        tfr = jnp.maximum(t0a, t1a)
        t0a = (root_ref[1, 0] - oy) * inv_dy
        t1a = (root_ref[4, 0] - oy) * inv_dy
        tfr = jnp.minimum(tfr, jnp.maximum(t0a, t1a))
        t0a = (root_ref[2, 0] - oz) * inv_dz
        t1a = (root_ref[5, 0] - oz) * inv_dz
        tfr = jnp.minimum(tfr, jnp.maximum(t0a, t1a))
        # Error model for the margin: a valid hit inside the root box has
        # EXACT t* <= exact root-exit. Both sides are computed in f32:
        # the slab exit accumulates <=3 rounding steps per axis
        # (subtract, multiply by the precomputed inverse, min/max chain),
        # and the Havel t adds ~6 more (two 3-term dot products and one
        # multiply against a reciprocal), so the computed values differ
        # from exact by a RELATIVE error well under 16 ulp ~ 2e-6 each —
        # the 1e-5 relative term (~84 ulp) covers the sum 4x over. The
        # relative term scales with tfr, so large-coordinate scenes stay
        # covered; the 1e-4 absolute term covers tfr ~ 0 where a relative
        # bound vanishes (both computations' absolute error floor is
        # ~FLT_MIN-scale there, far below 1e-4 for normalized
        # directions). Catastrophic cancellation cannot push the Havel t
        # HIGH relative to the slab exit beyond this: both difference
        # terms ((bound - o) and (dc - o.n)) cancel against the same ray
        # origin magnitude, so their absolute errors track each other
        # through the shared tfr magnitude.
        exit_pad = tfr * (1.0 + 1e-5) + 1e-4
        ceil0 = jnp.minimum(tcap_ref[0, r0:r1], jnp.maximum(exit_pad, 0.0))

        def horizon(best_t):
            return jnp.max(
                jnp.where(alive, jnp.minimum(best_t, ceil0), -jnp.inf)
            )

        # Triangle-row access. VMEM-resident mode slices trih directly.
        # STREAMING mode (trih in HBM, scenes too large for VMEM): a
        # double-buffered DMA pipeline — iteration i evaluates from
        # buffer i%2 while the DMA for leaf i+1 fills (i+1)%2. Every
        # walked leaf's tile is prefetched (waits are unconditional so
        # buffer reuse never races an in-flight copy); bandwidth is
        # ~walked x 12 x tile x 4 B per block — noise next to eval time.
        # Buffers are shared across the step's sub-blocks: each copy is
        # awaited before its slot is reused, and every sub-block drains
        # its last in-flight prefetch before the next sub-block starts.
        def start_dma(i):
            l_i = wl_ref[0, s, jnp.minimum(i, n_list - 1)]
            ts_i = lt_ref[0, l_i]
            slot = jax.lax.rem(i, 2)
            pltpu.make_async_copy(
                trih_ref.at[:, pl.ds(pl.multiple_of(ts_i, min(tile, 128)), tile)],
                trih_buf_ref.at[slot],
                dma_sem.at[slot],
            ).start()

        def wait_dma(i):
            slot = jax.lax.rem(i, 2)
            l_i = wl_ref[0, s, jnp.minimum(i, n_list - 1)]
            ts_i = lt_ref[0, l_i]
            pltpu.make_async_copy(
                trih_ref.at[:, pl.ds(pl.multiple_of(ts_i, min(tile, 128)), tile)],
                trih_buf_ref.at[slot],
                dma_sem.at[slot],
            ).wait()

        if stream:
            start_dma(jnp.int32(0))

        def hav_resident(row, ts):
            return trih_ref[row, pl.ds(pl.multiple_of(ts, min(tile, 128)), tile)][
                None, None, :
            ]

        def body(carry):
            i, best_t, code, tmax = carry
            l = wl_ref[0, s, i]
            if stream:
                # Overlap: kick off the next leaf's copy, then block on
                # this leaf's (usually already complete).
                @pl.when(i + 1 < count)
                def _():
                    start_dma(i + 1)

                wait_dma(i)
                tr = trih_buf_ref[jax.lax.rem(i, 2)]  # (12, tile)

                def hav(row, ts):
                    del ts
                    return tr[row][None, None, :]
            else:
                hav = hav_resident
            if prune:
                # Slab re-check against the LIVE best_t: front-to-back
                # order turns this into occlusion pruning — leaves fully
                # behind every ray's current hit are skipped with one
                # cheap (rows, 128) test.
                t0 = (lb_ref[0, l] - ox) * inv_dx
                t1 = (lb_ref[3, l] - ox) * inv_dx
                tn = jnp.minimum(t0, t1)
                tf = jnp.maximum(t0, t1)
                t0 = (lb_ref[1, l] - oy) * inv_dy
                t1 = (lb_ref[4, l] - oy) * inv_dy
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                t0 = (lb_ref[2, l] - oz) * inv_dz
                t1 = (lb_ref[5, l] - oz) * inv_dz
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                node_hit = (tf >= tn) & (tf >= tmin) & (tn < best_t) & alive
            else:
                node_hit = alive

            def eval_tile(carry):
                best_t, code, tmax = carry
                ts = lt_ref[0, l]
                nx, ny, nz = hav(0, ts), hav(1, ts), hav(2, ts)
                dc = hav(3, ts)
                dn = dxe * nx + dye * ny + dze * nz
                if backface_cull:
                    ok = dn < -FLT_EPSILON
                else:
                    ok = jnp.abs(dn) > FLT_EPSILON
                inv = 1.0 / jnp.where(ok, dn, 1.0)
                t = (dc - (oxe * nx + oye * ny + oze * nz)) * inv
                hx = oxe + t * dxe
                hy = oye + t * dye
                hz = oze + t * dze
                u = (hav(4, ts) * hx + hav(5, ts) * hy + hav(6, ts) * hz
                     + hav(7, ts))
                v = (hav(8, ts) * hx + hav(9, ts) * hy + hav(10, ts) * hz
                     + hav(11, ts))
                hit = (
                    ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > tmin) & (t < o1(best_t))
                    & (o1(node_hit.astype(jnp.int32)) != 0)
                )
                t_masked = jnp.where(hit, t, BIG)
                tile_best = jnp.min(t_masked, axis=-1)       # (rows, 128)
                improved = tile_best < best_t
                is_best = hit & (t_masked <= o1(tile_best))
                win_lane = jnp.min(
                    jnp.where(is_best, lane, _LANE_MAX), axis=-1
                )
                best_t = jnp.where(improved, tile_best, best_t)
                # VMEM-resident: tmax rides unchanged — the walk ceiling
                # is static (see cond); re-tightening it per eval from
                # best_t costs a cross-lane max + vector->scalar sync, a
                # measured net loss (1181 -> 1145 ms removing it, spp8
                # stress bench) against ~2 gate-only tail iterations.
                # STREAMING: keep the dynamic horizon — an exited leaf
                # also skips its HBM DMA, which is worth the sync
                # (mesh_large 1952 vs 2081 ms static).
                return (
                    best_t,
                    jnp.where(improved, ts + win_lane, code),
                    horizon(best_t) if stream else tmax,
                )

            if stats_ref is not None:
                stats_ref[0, s, 0] = stats_ref[0, s, 0] + 1

            def eval_and_count(c):
                if stats_ref is not None:
                    stats_ref[0, s, 1] = stats_ref[0, s, 1] + 1
                return eval_tile(c)

            if not prune:
                bt, cd, tmax = eval_and_count((best_t, code, tmax))
            else:
                # The per-leaf cond is a measured WIN: evaluating every
                # walked leaf unconditionally (no cond, no slab gate)
                # benched 9803 ms vs 6527 ms on the materialball scene —
                # a 128x128 Havel tile eval costs ~3x the cond+slab gate,
                # and only ~1/3 of walked leaves can improve any ray.
                bt, cd, tmax = jax.lax.cond(
                    jnp.any(node_hit), eval_and_count, lambda c: c,
                    (best_t, code, tmax),
                )
            return (i + 1, bt, cd, tmax)

        def cond(carry):
            i, _, _, tmax = carry
            if not prune:
                return i < count
            # Occlusion-horizon cutoff: entry is ascending and
            # entry[b,i] = min over the block's rays of leaf i's slab tn,
            # so a ray's tn for ANY remaining leaf is >= entry[i]. Once
            # entry[i] >= every live ray's search ceiling, no remaining
            # leaf can produce a closer hit — stop the walk. The ceiling
            # is STATIC (one reduction per block from the analytic-
            # occlusion seed + root exit): re-tightening it per eval from
            # mesh best_t was measured a net LOSS at stress scale — each
            # update is a cross-lane max + vector->scalar sync (~10 per
            # block-bounce) to save ~2 gate-only tail iterations.
            nxt = entry_ref[0, s, jnp.minimum(i, n_list - 1)]
            return (i < count) & (nxt < tmax)

        init_t = tcap_ref[0, r0:r1]  # analytic-occlusion ceiling
        final_i, best_t, code, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0),
             init_t,
             jnp.full(shape, -1, jnp.int32),
             horizon(init_t)),
        )
        if stream:
            # Horizon early-exit leaves the prefetch for index final_i
            # in flight; drain it so the kernel never ends with an
            # outstanding DMA.
            @pl.when(final_i < count)
            def _():
                wait_dma(final_i)

        t_ref[0, r0:r1] = jnp.where(code >= 0, best_t, BIG)
        code_ref[0, r0:r1] = code


def _build_worklist_frustum(ox, oy, oz, dx, dy, dz, alive, leaf_bounds,
                            tmin, block, tcap=None):
    """Packet-frustum work lists: O(blocks x leaves) instead of
    O(rays x leaves).

    Classic packet tracing shaped for XLA: the wavefront sort
    (ops/wavefront_sort.py) makes each block a tight ray packet, so a
    CONSERVATIVE interval slab test of the packet's origin box x direction
    interval against each leaf AABB replaces the exact per-ray pass. Lists
    are supersets of the exact hit-any union (interval arithmetic: all
    endpoint products, direction intervals spanning zero degrade to
    unconstrained via the clamped inverses); the winner kernel's exact
    per-leaf slab prune rejects the extras per ray before any Havel work.
    """
    n = ox.shape[0]
    n_blocks = n // block
    L = leaf_bounds.shape[1]
    eps = 1e-20
    av = alive != 0

    def bnds(c):
        cb = c.reshape(n_blocks, block)
        lo_ = jnp.min(jnp.where(av.reshape(n_blocks, block), cb, jnp.inf),
                      axis=1)
        hi_ = jnp.max(jnp.where(av.reshape(n_blocks, block), cb, -jnp.inf),
                      axis=1)
        return lo_, hi_                      # (B,), (B,)

    o_b = [bnds(c) for c in (ox, oy, oz)]
    d_b = [bnds(c) for c in (dx, dy, dz)]
    any_alive = jnp.any(av.reshape(n_blocks, block), axis=1)

    def safe_inv(d):
        return 1.0 / jnp.where(
            jnp.abs(d) < eps, jnp.where(d >= 0.0, eps, -eps), d
        )

    tn_lo = jnp.full((n_blocks, L), -jnp.inf, jnp.float32)
    tf_hi = jnp.full((n_blocks, L), jnp.inf, jnp.float32)
    for a in range(3):
        lo_a = leaf_bounds[a][None, :]       # (1, L)
        hi_a = leaf_bounds[3 + a][None, :]
        o_lo, o_hi = o_b[a]
        ilo = safe_inv(d_b[a][0])[:, None]   # (B, 1)
        ihi = safe_inv(d_b[a][1])[:, None]
        # Numerator intervals for the two slab planes.
        cands = []
        for num in (lo_a - o_hi[:, None], lo_a - o_lo[:, None],
                    hi_a - o_hi[:, None], hi_a - o_lo[:, None]):
            cands.append(num * ilo)
            cands.append(num * ihi)
        axis_min = cands[0]
        axis_max = cands[0]
        for c in cands[1:]:
            axis_min = jnp.minimum(axis_min, c)
            axis_max = jnp.maximum(axis_max, c)
        # A direction interval spanning zero makes 1/d unbounded BETWEEN
        # the endpoints — endpoint products are not conservative there;
        # degrade the axis to unconstrained.
        span0 = ((d_b[a][0] < 0.0) & (d_b[a][1] > 0.0))[:, None]
        axis_min = jnp.where(span0, -jnp.inf, axis_min)
        axis_max = jnp.where(span0, jnp.inf, axis_max)
        tn_lo = jnp.maximum(tn_lo, axis_min)
        tf_hi = jnp.minimum(tf_hi, axis_max)

    hitb = (tf_hi >= tn_lo) & (tf_hi >= tmin) & any_alive[:, None]
    if tcap is not None:
        # Conservative per-block occlusion ceiling: tn_lo is a LOWER
        # bound on every ray's leaf entry, so a leaf with tn_lo beyond
        # the block's largest per-ray analytic-occlusion cap cannot yield
        # a winning hit for any ray (the kernel seeds best_t with tcap).
        tc_blk = jnp.max(
            jnp.where(av.reshape(n_blocks, block), tcap.reshape(
                n_blocks, block), -jnp.inf), axis=1)
        hitb = hitb & (tn_lo <= tc_blk[:, None])
    key = jnp.where(hitb, tn_lo, jnp.inf)
    entry, order = jax.lax.sort(
        (key, jax.lax.broadcasted_iota(jnp.int32, (n_blocks, L), 1)),
        num_keys=1,
    )
    counts = hitb.sum(axis=1).astype(jnp.int32)
    return (counts[:, None, None], order[:, None, :], entry[:, None, :])


# VMEM-resident triangle rows above this byte size won't fit next to the
# ray blocks (v5e VMEM ~16 MB); stream them from HBM per leaf instead.
STREAM_TRIH_BYTES = 6 * 1024 * 1024

# Ray blocks served per winner-kernel grid step (sequential walks over
# per-block work lists): amortizes the fixed per-step cost that dominates
# when lists are short. Wavefronts are padded to block*WINNER_SUB rays.
WINNER_SUB = 4


@functools.partial(
    jax.jit,
    static_argnames=("tmin", "backface_cull", "tile", "prune", "interpret",
                     "block", "stats"),
)
def _run_winner(ray_comps, counts, order, entry, root_bounds, leaf_bounds,
                leaf_tiles, trih, tmin, backface_cull, tile, prune,
                interpret, block=RAY_BLOCK, stats=False):
    ox, oy, oz, dx, dy, dz, alive, tcap = ray_comps
    n = ox.shape[0]
    n_blocks = n // block
    rows = block // 128
    # Sub-block batching: each grid step walks WINNER_SUB consecutive
    # blocks' work lists sequentially (see _winner_kernel) — the caller
    # pads the wavefront to a block*WINNER_SUB multiple.
    sub = WINNER_SUB if n_blocks % WINNER_SUB == 0 else 1
    n_steps = n_blocks // sub
    L = leaf_bounds.shape[1]
    # Large meshes: keep the Havel rows in HBM and double-buffer per-leaf
    # DMA inside the kernel (interpret mode has no DMA semantics — stay
    # resident there, CPU memory is plentiful). RTNW_STREAM_BYTES
    # overrides the threshold (testing).
    import os

    thresh = int(os.environ.get("RTNW_STREAM_BYTES", STREAM_TRIH_BYTES))
    stream = (trih.size * 4 > thresh) and not interpret
    if stream:
        # DMA slices must be 8-aligned on the sublane dim: pad the 12
        # Havel rows to 16 so each per-leaf copy moves full rows.
        trih = jnp.pad(trih, ((0, 4), (0, 0)))

    def rs(a):
        return a.reshape(n_steps, sub * rows, 128)

    kern = functools.partial(
        _winner_kernel, tmin=tmin, backface_cull=backface_cull,
        tile=tile, prune=prune, rows=rows, sub=sub, stats=stats,
        stream=stream,
    )
    ray_spec = pl.BlockSpec(
        (1, sub * rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    smem_all = pl.BlockSpec(memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec((1, sub, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    wl_spec = pl.BlockSpec((1, sub, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.SMEM)

    out_specs = [ray_spec, ray_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n_steps, sub * rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, sub * rows, 128), jnp.int32),
    ]
    if stats:  # profiling: per-block [walked, evaluated] leaf counters
        out_specs.append(pl.BlockSpec((1, sub, 2), lambda i: (i, 0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_steps, sub, 2), jnp.int32))

    trih_spec = pl.BlockSpec(
        memory_space=pltpu.ANY if stream else pltpu.VMEM
    )
    scratch_shapes = (
        [pltpu.VMEM((2, 16, tile), jnp.float32),
         pltpu.SemaphoreType.DMA((2,))]
        if stream else []
    )

    def rs3(a):
        return a.reshape(n_steps, sub, -1)

    out = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=(
            [cnt_spec, wl_spec, wl_spec, smem_all, smem_all, smem_all]
            + [ray_spec] * 8
            + [trih_spec]
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        rs3(counts), rs3(order), rs3(entry), root_bounds, leaf_bounds,
        leaf_tiles,
        rs(ox), rs(oy), rs(oz), rs(dx), rs(dy), rs(dz), rs(alive), rs(tcap),
        trih,
    )
    if stats:
        return (out[0].reshape(n), out[1].reshape(n),
                out[2].reshape(n_blocks, 2))
    return out[0].reshape(n), out[1].reshape(n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _winner_nodiff(args, tmin, backface_cull, tile, prune, interpret, block):
    """Selection-only winner (zero VJP — recompute shading outside)."""
    (ray_comps, counts, order, entry, root_bounds, leaf_bounds,
     leaf_tiles, trih) = args
    return _run_winner(ray_comps, counts, order, entry, root_bounds,
                       leaf_bounds, leaf_tiles, trih, tmin, backface_cull,
                       tile, prune, interpret, block)


def _winner_fwd(args, tmin, backface_cull, tile, prune, interpret, block):
    return _winner_nodiff(args, tmin, backface_cull, tile, prune,
                          interpret, block), args


def _winner_bwd(tmin, backface_cull, tile, prune, interpret, block,
                residuals, _ct):
    return (jax.tree_util.tree_map(jnp.zeros_like, residuals),)


_winner_nodiff.defvjp(_winner_fwd, _winner_bwd)


def intersect_packed_bvh(rays, packed, tmin=EPSILON,
                         backface_cull: bool = True,
                         interpret: bool = False, alive=None, t_cap=None,
                         stats: bool = False):
    """Closest triangle hit through the tile-BVH work-list winner kernel.

    Returns (t, code): code < 0 on miss, else TYPE_TRIANGLE << 24 | column
    of the winning triangle in the packed (permuted, padded) order — the
    row index into scene.triangles for the differentiable recompute.

    `t_cap` (N,) optionally carries each ray's closest ANALYTIC hit t
    (BIG where none): the kernel searches only in front of it, so walls
    occluding the mesh prune leaf visits per ray. Triangles at t >= t_cap
    are never reported — identical to the caller's closest-t merge, minus
    the wasted work.
    """
    assert packed.leaf_bounds is not None, "scene packed without a tile-BVH"
    import os

    # Consensus block size: smaller blocks have a tighter spatial
    # footprint, so each ray shares fewer over-included leaves. 128-ray
    # blocks (one lane group) won the round-4 full-bench sweep: 6527 ms vs
    # 7225 ms at 256 and ~9.6 s at 1024 on cornellbox2+materialball
    # 512x512x32spp. NOTE for sweeps: the value is baked at trace time —
    # run each setting in a fresh process.
    block = int(os.environ.get("RTNW_WINNER_BLOCK", "128"))
    assert block % 128 == 0
    n = rays.origin.shape[0]
    # Pad to a block*WINNER_SUB multiple so the kernel can batch
    # WINNER_SUB blocks per grid step (padding rays are dead: their
    # blocks carry empty work lists and skip instantly).
    quant = block * WINNER_SUB
    n_pad = ((n + quant - 1) // quant) * quant

    def pad(a, fill=0.0):
        return (
            jnp.pad(a, (0, n_pad - n), constant_values=fill)
            if n_pad != n else a
        )

    if alive is None:
        alive_i = jnp.ones((n,), jnp.int32)
    else:
        alive_i = alive.astype(jnp.int32)
    sg = jax.lax.stop_gradient
    if t_cap is None:
        tcap = jnp.full((n,), BIG, jnp.float32)
    else:
        tcap = jnp.minimum(sg(t_cap.astype(jnp.float32)), BIG)
    comps = tuple(
        sg(pad(c)) for c in (
            rays.origin[:, 0], rays.origin[:, 1], rays.origin[:, 2],
            rays.direction[:, 0], rays.direction[:, 1], rays.direction[:, 2],
        )
    ) + (pad(alive_i), pad(tcap, fill=BIG))
    counts, order, entry = build_worklist(
        *comps[:6], comps[6], sg(packed.leaf_bounds), tmin=float(tmin),
        block=block, interpret=bool(interpret),
        frustum=use_frustum_worklist(packed.leaf_bounds.shape[1]),
        tcap=comps[7],
    )
    # Profiling ablation ONLY (wrong image): build the work lists but skip
    # the winner kernel — isolates list-build cost from kernel cost.
    if os.environ.get("RTNW_DEBUG_WL_ONLY") == "1":
        import warnings

        warnings.warn(
            "RTNW_DEBUG_WL_ONLY=1: profiling ablation active — the "
            "rendered image is WRONG (every mesh ray misses). Baked into "
            "the jit cache at trace time.",
            stacklevel=2,
        )
        dep = (counts.ravel().sum() & 0) - 1  # data dep, always -1
        t = jnp.full((n_pad,), BIG, jnp.float32)
        return t[:n], jnp.full((n,), 1, jnp.int32) * dep

    # Geometry rows only (the 8 material rows are resolved outside).
    trih_geom = sg(packed.trih[:12])

    # Root box = union of the leaf boxes, as (6, 1) SMEM scalars for the
    # kernel's root-exit horizon.
    lbs = sg(packed.leaf_bounds)
    root_bounds = jnp.concatenate(
        [jnp.min(lbs[0:3], axis=1), jnp.max(lbs[3:6], axis=1)]
    )[:, None]

    L = packed.leaf_bounds.shape[1]
    tile = packed.trih.shape[1] // L  # uniform lane-tile width per leaf
    prune = not os.environ.get("RTNW_NO_PRUNE")
    if stats:  # profiling path: also return per-block [walked, evaluated]
        t, code, st = _run_winner(
            comps, counts, order, entry, root_bounds, sg(packed.leaf_bounds),
            sg(packed.leaf_tiles), trih_geom, float(tmin),
            bool(backface_cull), int(tile), prune, bool(interpret), block,
            stats=True,
        )
        code = jnp.where(code >= 0, (TYPE_TRIANGLE << 24) | code, -1)
        return t[:n], code[:n], (counts.ravel(), st)
    t, code = _winner_nodiff(
        (comps, counts, order, entry, root_bounds, sg(packed.leaf_bounds),
         sg(packed.leaf_tiles), trih_geom),
        float(tmin), bool(backface_cull), int(tile), prune, bool(interpret),
        block,
    )
    code = jnp.where(code >= 0, (TYPE_TRIANGLE << 24) | code, -1)
    return t[:n], code[:n]


__all__ = ["build_worklist", "intersect_packed_bvh",
           "use_frustum_worklist", "FRUSTUM_LEAF_THRESHOLD"]
