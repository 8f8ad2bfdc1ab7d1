"""Run just the mesh bench (cornellbox2 + materialball) and print JSON."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingthenextweekcuda_tpu.apps.bench import run_mesh_bench

stride = int(os.environ.get("RTNW_SORT_STRIDE", "1"))
print(json.dumps(run_mesh_bench(sort_stride=stride)), flush=True)
