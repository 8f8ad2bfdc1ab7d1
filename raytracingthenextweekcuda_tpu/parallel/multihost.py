"""Multi-host initialization + scaling measurement.

The reference is single-process/single-GPU; this is the pod-slice story
(BASELINE north star: >=8x rays/s from 1 chip to v5p-16 at >75% efficiency).
Standard JAX multi-host: every host runs the same program,
`jax.distributed.initialize` wires them, and the global mesh spans all
chips. The render is data-parallel over tiles with a replicated scene, so
there is no cross-chip traffic in the forward pass at all — scaling
efficiency is bounded by compile-time variance and the final image
assembly, not by collectives; the backward pass adds one psum of
scene-parameter gradients over ICI.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def init_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize JAX distributed (no-op if single-process or already up).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly only for manual clusters.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # Single-process environment: nothing to initialize.
        pass


def measure_scaling(scene, camera, cfg, device_counts=None, spp: int = 8,
                    verbose: bool = True):
    """Throughput vs device count on this host's devices.

    Returns {n_devices: paths_per_sec}. Efficiency(n) =
    rate(n) / (n * rate(1)).
    """
    from raytracingthenextweekcuda_tpu.parallel.mesh import make_mesh
    from raytracingthenextweekcuda_tpu.parallel.render import render_pass_sharded
    from raytracingthenextweekcuda_tpu.utils.timing import sync

    if device_counts is None:
        n = len(jax.devices())
        device_counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n]

    results = {}
    key = jax.random.key(0)
    for n_dev in device_counts:
        mesh = make_mesh(n_dev)
        out = render_pass_sharded(scene, camera, key, cfg, spp, mesh)
        sync(out)  # compile + warm
        t0 = time.perf_counter()
        out = render_pass_sharded(scene, camera, jax.random.fold_in(key, 1), cfg, spp, mesh)
        sync(out)
        dt = time.perf_counter() - t0
        rate = cfg.num_pixels * spp / dt
        results[n_dev] = rate
        if verbose:
            base = results[device_counts[0]] * n_dev / device_counts[0]
            print(
                f"  {n_dev:3d} devices: {rate / 1e6:8.2f} Mpaths/s "
                f"(efficiency {rate / base * 100:5.1f}%)"
            )
    return results
