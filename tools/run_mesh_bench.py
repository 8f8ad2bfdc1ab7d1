"""Run the mesh benches (suzanne parity + materialball stress), print JSON.

RTNW_SORT_STRIDE / RTNW_MESH_ONLY=parity|stress select variants.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingthenextweekcuda_tpu.apps.bench import (
    run_mesh_bench,
    run_mesh_stress,
)

stride = int(os.environ.get("RTNW_SORT_STRIDE", "1"))
sort_rays = os.environ.get("RTNW_SORT_RAYS", "1") == "1"
which = os.environ.get("RTNW_MESH_ONLY", "")
if which != "stress":
    print(json.dumps({"mesh_bvh": run_mesh_bench(
        sort_stride=stride, sort_rays=sort_rays)}), flush=True)
if which != "parity":
    print(json.dumps({"mesh_stress": run_mesh_stress(
        sort_stride=stride, sort_rays=sort_rays)}), flush=True)
