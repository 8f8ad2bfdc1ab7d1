"""Capture a jax.profiler device trace of the headline megastep render.

Writes the trace under /tmp/rtnw_trace and prints the top ops by self
time (parsed with tensorboard_plugin_profile), giving the measured — not
hand-modeled — utilization picture for the analytic Cornell bench.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracingthenextweekcuda_tpu.config import RenderConfig
from raytracingthenextweekcuda_tpu.models import integrator, presets
from raytracingthenextweekcuda_tpu.models.scene import finalize

TRACE_DIR = "/tmp/rtnw_trace"


def main():
    scene, camera = presets.cornell_box()
    scene = finalize(scene)
    cfg = RenderConfig(width=512, height=512, spp=128, bounces=10,
                       spp_per_pass=128)
    key = jax.random.key(cfg.seed)

    def sync(x):
        np.asarray(jnp.sum(x))

    sync(integrator.render(scene, camera, cfg, key=key).accum)  # warm
    jax.profiler.start_trace(TRACE_DIR)
    sync(integrator.render(scene, camera, cfg, key=key).accum)
    jax.profiler.stop_trace()
    print("trace written", flush=True)

    # Parse: find the xplane proto and print op self-times.
    planes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", planes, flush=True)
    if not planes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data


        data, _ = raw_to_tool_data.xspace_to_tool_data(
            planes, "op_profile", {}
        )
        out = "/tmp/rtnw_trace/op_profile.json"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print("op_profile ->", out, flush=True)
    except Exception as e:
        print("op_profile failed:", e, flush=True)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            planes, "overview_page", {}
        )
        out = "/tmp/rtnw_trace/overview.json"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print("overview ->", out, flush=True)
    except Exception as e:
        print("overview failed:", e, flush=True)


if __name__ == "__main__":
    main()
