"""Sweep winner-kernel leaf-tile size x sort stride on the mesh_stress bench.

Each config renders the full stress workload (cornellbox2 + materialball,
512x512 x 32spp x 10 bounces) through the production path. RTNW_LEAF is
consumed by finalize at scene-build time, so multiple leaf sizes run in one
process (different shapes -> separate jit cache entries).

Usage: PYTHONPATH=/root/repo python tools/sweep_stress.py "128,1 256,1 ..."
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingthenextweekcuda_tpu.apps.bench import run_mesh_stress

configs = sys.argv[1] if len(sys.argv) > 1 else "128,1 256,1 512,1 128,2 256,2"
for tok in configs.split():
    leaf, stride = (int(x) for x in tok.split(","))
    os.environ["RTNW_LEAF"] = str(leaf)
    out = run_mesh_stress(sort_stride=stride)
    out["leaf"] = leaf
    out["stride"] = stride
    print(json.dumps({k: out[k] for k in
                      ("leaf", "stride", "render_ms", "paths_per_sec")}),
          flush=True)
