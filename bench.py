#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line.

Metric: camera paths/s on the Cornell box (walls + area light + metal/glass
spheres + two cube meshes) at 512x512, spp=128, 10 bounces — the BASELINE.json
headline config. vs_baseline is the ratio to the reference's best published
throughput (512x512 x 32 spp in 3857.46 ms, images/images.MD:44-53).
"""

import json
import sys


def main() -> int:
    import jax

    # Persistent compilation cache: remote compiles through the axon relay
    # can take minutes; cached executables make repeat runs start instantly.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracingthenextweekcuda_tpu.apps.bench import run_bench

    result = run_bench()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
