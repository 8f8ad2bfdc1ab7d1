"""Render configuration.

One typed config replaces the reference's three config tiers (compile-time
`#define RESOLUTION/SCENE/GPU_REALTIME/BOUNCES` in main.cu:208-233, runtime
YAML camera/object schema, ImGui sliders): everything is a runtime value here,
and anything that changes traced shapes (width/height/spp/bounces) is a static
field of the jitted render step.

RTNW_* environment knobs (complete inventory; all are read at trace/pack
time and baked into the jit cache — set them in a FRESH process for sweeps):

Performance knobs (image-invariant; covered by tests/test_env_knobs.py):
  RTNW_LEAF          tile-BVH leaf tile width in triangles (default 768 —
                     models/scene.py; measured sweep tools/sweep_stress.py).
  RTNW_WINNER_BLOCK  winner-kernel consensus block size in rays (default
                     128; ops/pallas/bvh_winner_kernel.py).
  RTNW_WL_FRUSTUM    1/0 force the packet-frustum work-list build on/off
                     (default: auto above FRUSTUM_LEAF_THRESHOLD leaves).
  RTNW_STREAM_BYTES  VMEM-residency threshold in bytes for the winner
                     kernel's Havel rows; larger scenes stream via DMA.
  RTNW_KEY_DIRBITS   direction-refinement bits in the coherence-sort key
                     (default 2; ops/wavefront_sort.py).

Test harness:
  RTNW_TEST_TPU      1 keeps the real backend in pytest (tests/conftest.py
                     pins CPU otherwise) so TPU-gated tests — e.g. the
                     HBM-streaming DMA bit-identity check — actually run.

Ablation/debug flags (some render a WRONG image and warn loudly):
  RTNW_NO_PRUNE        disable the per-leaf slab re-check + occlusion
                       horizon (correct image, slower — ablation).
  RTNW_DEBUG_WL_ONLY   build work lists but skip the winner kernel
                       (WRONG image; isolates list-build cost).
  RTNW_DEBUG_SKIP_MESH skip the mesh branch of the fused intersect
                       (WRONG image; times sort+analytic+shade).
  RTNW_SKIP_RESOLVE    skip the megastep's winner-attribute resolution
                       sweep (WRONG image; timing probe).

Tool-only variables (consumed by tools/run_mesh_bench.py, never by the
library): RTNW_SORT_STRIDE, RTNW_SORT_RAYS, RTNW_MESH_ONLY.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# The reference's float configuration (CUDATypes.h:12-19): Float = float32 by
# default with a USE_DOUBLE escape hatch. On TPU float32 runs on the VPU at
# full rate; float64 is for CPU-side oracles only.
DTYPE = jnp.float32

# Math::epsilon (Constants.h:23) — ray tMin and plane denominator threshold.
EPSILON = 1e-3
# FLT_EPSILON — sphere discriminant + front-face tests (Sphere.cu:11,
# HitResult.h:16) use the much tighter machine epsilon, not Math::epsilon.
FLT_EPSILON = 1.1920929e-7
INFINITY = float("inf")


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static parameters of a render.

    Mirrors the union of the reference's compile-time knobs:
    width/height (`RESOLUTION`, main.cu:208-231), spp (main.cu:165-169),
    bounces (`BOUNCES`=10 main.cu:23 for the OOP engine, 5 for the BVH engine
    CUDAPathTracer.cu:366), and adds the north-star extensions (Russian
    roulette, sharding, precision) that have no reference counterpart.
    """

    width: int = 512
    height: int = 512
    spp: int = 32
    bounces: int = 10
    # Ray epsilon used as tMin on every bounce (main.cu:69 uses Math::epsilon).
    tmin: float = EPSILON
    # Samples traced per device pass; 0 means "all at once". The fused
    # whole-render kernel loops samples in VMEM, so HBM use is O(pixels)
    # regardless of pass size and one dispatch is fastest; per-pass chunking
    # matters only for progressive/resumable renders and the XLA
    # (differentiable) engine's peak memory.
    spp_per_pass: int = 0
    # Russian roulette (absent in the reference; CUDAPathTracer.cu:532 TODO).
    russian_roulette: bool = False
    rr_start_bounce: int = 3
    # Background: RTiOW sky gradient (main.cu:86-89). When False the miss
    # shade is black (Path B style, CUDAPathTracer.cu:417).
    sky_background: bool = True
    # curand seed 1984 (main.cu:127) — here the root of the PRNG key tree.
    seed: int = 1984
    # Render each bounce as ONE fused Pallas megastep (intersect + shade +
    # scatter in VMEM, ops/pallas/bounce_kernel.py) when the scene is
    # eligible (all primitives packed, no BVH). Forward-only: differentiating
    # a fused-bounce render raises with instructions to set this False (the
    # XLA wavefront path is the differentiable engine; both consume the same
    # RNG stream and agree to float tolerance).
    fused_bounce: bool = True
    # Sort the ray wavefront between bounces on BVH (tile-traversal) scenes:
    # key = direction octant + position morton, dead rays last. Sorted
    # blocks are spatially coherent, so the megastep's block-consensus
    # traversal skips most leaf tiles, and dead rays cluster into whole
    # skipped blocks (compaction for free). The per-pixel counter RNG makes
    # the sorted render bit-identical to the unsorted one.
    sort_rays: bool = True
    # Re-sort every k-th bounce (1 = every bounce). Block coherence decays
    # gradually after a diffuse bounce, so skipping sorts trades larger
    # winner-kernel work lists for fewer multi-operand sorts; the image is
    # bit-identical for any stride (sorting is a permutation).
    sort_stride: int = 1

    @property
    def aspect_ratio(self) -> float:
        return self.width / self.height

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def passes(self) -> list[int]:
        """Split ``spp`` into per-pass sample counts."""
        chunk = self.spp_per_pass if self.spp_per_pass > 0 else self.spp
        chunk = max(1, min(chunk, self.spp))
        counts = [chunk] * (self.spp // chunk)
        if self.spp % chunk:
            counts.append(self.spp % chunk)
        return counts
