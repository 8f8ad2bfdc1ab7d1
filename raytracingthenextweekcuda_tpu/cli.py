"""Command-line frontend.

Replaces the reference's offline main() (main.cu:938-955): render a scene to
PNG with timing. Subcommands:

    rtnw render --scene scenes/cornellbox.yaml --spp 128 --out render.png
    rtnw render --preset cornell --width 512 --height 512
    rtnw bench  [--width 512 --height 512 --spp 128]
    rtnw fit    --steps 60       (inverse-rendering demo, BASELINE config 5)
    rtnw live   --preset cornell (interactive progressive preview: terminal
                                  or HTTP view, WASDQE/orbit camera)

(The realtime OpenGL/ImGui frontend maps to `rtnw render --progressive`,
which re-renders progressively and rewrites the output each pass — the
accumulate/reset protocol of main.cu:875-898 without a GL window.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_scene(args):
    from raytracingthenextweekcuda_tpu.models import presets

    if args.scene:
        from raytracingthenextweekcuda_tpu.io.yaml_scene import load_scene

        return load_scene(args.scene)
    name = args.preset or "cornell"
    table = {
        "cornell": presets.cornell_box,
        "cornell-empty": lambda: presets.cornell_box(with_spheres=False, with_cubes=False),
        "defocus": presets.defocus_blur,
        "rtiow-final": presets.rtiow_final,
        "sphere-plane": presets.diffuse_sphere_plane,
        "mesh": presets.mesh_showcase,
        "smallpt": presets.smallpt_spheres,
    }
    if name not in table:
        raise SystemExit(f"unknown preset '{name}' (choose from {sorted(table)})")
    return table[name]()


def cmd_render(args) -> int:
    import jax

    from raytracingthenextweekcuda_tpu.config import RenderConfig
    from raytracingthenextweekcuda_tpu.io.image import write_png
    from raytracingthenextweekcuda_tpu.models import integrator
    from raytracingthenextweekcuda_tpu.models.film import Film, to_image

    if args.debug_nan:
        import jax

        jax.config.update("jax_debug_nans", True)  # gpuErrorCheck analogue

    from raytracingthenextweekcuda_tpu.utils.log import report_devices

    print(report_devices(), file=sys.stderr)  # Utils::queryDeviceProperties

    scene, camera = _build_scene(args)
    cfg = RenderConfig(
        width=args.width, height=args.height, spp=args.spp,
        bounces=args.bounces, spp_per_pass=args.spp_per_pass,
        russian_roulette=args.russian_roulette, seed=args.seed,
    )
    from raytracingthenextweekcuda_tpu.models.scene import finalize

    scene = finalize(scene, use_bvh=True if args.bvh else None)

    print(
        f"rendering {cfg.width}x{cfg.height} spp={cfg.spp} bounces={cfg.bounces} "
        f"on {jax.devices()[0].platform}", file=sys.stderr,
    )
    if args.shards > 1:
        from raytracingthenextweekcuda_tpu.parallel.mesh import make_mesh
        from raytracingthenextweekcuda_tpu.parallel.render import render_sharded

        mesh = make_mesh(args.shards)
        t0 = time.perf_counter()
        film = render_sharded(scene, camera, cfg, mesh)
        film.accum.block_until_ready()
        write_png(args.out, to_image(film))
        print(
            f"rendered on {mesh.size} shards in "
            f"{(time.perf_counter() - t0) * 1000:.1f} ms -> {args.out}",
            file=sys.stderr,
        )
        return 0
    if args.progressive:
        film = Film.create(cfg.width, cfg.height)
        key = jax.random.key(cfg.seed)
        t0 = time.perf_counter()
        for i, chunk in enumerate(cfg.passes()):
            film = film.add(
                integrator.render_pass(scene, camera, jax.random.fold_in(key, i), cfg, chunk),
                chunk,
            )
            film.accum.block_until_ready()
            write_png(args.out, to_image(film))
            print(
                f"  pass {i}: {int(film.sample_count)} spp, "
                f"{time.perf_counter() - t0:.2f}s -> {args.out}", file=sys.stderr,
            )
    elif args.checkpoint:
        from raytracingthenextweekcuda_tpu.models.checkpoint import render_resumable

        t0 = time.perf_counter()
        film = render_resumable(scene, camera, cfg, args.checkpoint)
        film.accum.block_until_ready()
        write_png(args.out, to_image(film))
        print(
            f"rendered (resumable via {args.checkpoint}) in "
            f"{(time.perf_counter() - t0) * 1000:.1f} ms -> {args.out}",
            file=sys.stderr,
        )
        return 0
    else:
        from raytracingthenextweekcuda_tpu.models.film import Film
        from raytracingthenextweekcuda_tpu.utils.progress import Progress
        from raytracingthenextweekcuda_tpu.utils.timing import sync

        passes = cfg.passes()
        progress = Progress(len(passes))  # 10%-step prints (main.cu:197-203)
        film = Film.create(cfg.width, cfg.height)
        key = jax.random.key(cfg.seed)
        t0 = time.perf_counter()
        for i, chunk in enumerate(passes):
            film = film.add(
                integrator.render_pass(scene, camera, jax.random.fold_in(key, i), cfg, chunk),
                chunk,
            )
            sync(film.accum)
            progress.update()
        dt = time.perf_counter() - t0
        write_png(args.out, to_image(film))
        rays = cfg.num_pixels * cfg.spp
        print(
            f"rendered in {dt * 1000:.1f} ms "
            f"({rays / dt / 1e6:.2f} Mpaths/s) -> {args.out}", file=sys.stderr,
        )
    return 0


def cmd_bench(args) -> int:
    from raytracingthenextweekcuda_tpu.apps.bench import run_bench

    result = run_bench(
        width=args.width, height=args.height, spp=args.spp, bounces=args.bounces
    )
    print(json.dumps(result))
    return 0


def cmd_fit(args) -> int:
    if args.mesh:
        from raytracingthenextweekcuda_tpu.apps.fit import run_fit_mesh

        return run_fit_mesh(steps=args.steps, out=args.out)
    from raytracingthenextweekcuda_tpu.apps.fit import run_fit

    return run_fit(steps=args.steps, out=args.out)


def cmd_live(args) -> int:
    """Live progressive preview: the realtime-frontend analogue with an
    actual display loop (terminal half-block or HTTP auto-refresh view)
    and the reference's WASDQE/orbit/FOV controls + dirty-reset
    (OpenGLFrontend.cpp:538-612 + main.cu:875-888)."""
    from raytracingthenextweekcuda_tpu.apps.interactive import (
        InteractiveSession,
    )
    from raytracingthenextweekcuda_tpu.apps.viewer import (
        HTTPViewer,
        TerminalViewer,
        run_live,
    )
    from raytracingthenextweekcuda_tpu.config import RenderConfig
    from raytracingthenextweekcuda_tpu.models.scene import finalize

    scene, camera = _build_scene(args)
    scene = finalize(scene)
    cfg = RenderConfig(width=args.width, height=args.height, spp=1,
                       bounces=args.bounces)
    session = InteractiveSession(scene, camera, cfg,
                                 spp_per_frame=args.spp_per_frame)
    if args.view == "http":
        viewer = HTTPViewer(port=args.port)
        print(f"serving live view on http://127.0.0.1:{viewer.port}/",
              file=sys.stderr)
    else:
        viewer = TerminalViewer()
    commands = args.script.split() if args.script else None
    print("controls: w/s walk a/d strafe q/e raise j/l yaw i/k pitch "
          "o orbit [/] fov enter=screenshot . idle x quit",
          file=sys.stderr)
    shots = run_live(session, commands=commands, viewer=viewer,
                     frames_per_command=args.frames_per_command)
    for s in shots:
        print(f"screenshot -> {s}", file=sys.stderr)
    return 0


def _apply_platform(platform: str | None) -> None:
    """Select the JAX backend. Some environments pin JAX_PLATFORMS via
    sitecustomize before user code runs, so an env var is not enough — we
    must set the config directly (before first backend use)."""
    import os

    platform = platform or os.environ.get("RTNW_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rtnw", description=__doc__)
    p.add_argument("--platform", help="JAX backend override (cpu/tpu/...); "
                   "also honored from $RTNW_PLATFORM")
    sub = p.add_subparsers(dest="command", required=True)

    pr = sub.add_parser("render", help="render a scene to PNG")
    pr.add_argument("--scene", help="YAML scene file (reference schema)")
    pr.add_argument("--preset", help="built-in scene preset")
    pr.add_argument("--width", type=int, default=512)
    pr.add_argument("--height", type=int, default=512)
    pr.add_argument("--spp", type=int, default=32)
    pr.add_argument("--bounces", type=int, default=10)
    pr.add_argument("--spp-per-pass", type=int, default=0,
                    help="samples per device dispatch; 0 = all at once "
                    "(the fused whole-render kernel holds one sample in "
                    "VMEM regardless, so one dispatch is fastest)")
    pr.add_argument("--seed", type=int, default=1984)
    pr.add_argument("--out", default="render.png")
    pr.add_argument("--bvh", action="store_true", help="build LBVH over meshes")
    pr.add_argument("--shards", type=int, default=1,
                    help="shard the render over N devices (tile data-parallel)")
    pr.add_argument("--russian-roulette", action="store_true")
    pr.add_argument("--progressive", action="store_true",
                    help="write the PNG after every pass (realtime-frontend analogue)")
    pr.add_argument("--checkpoint", metavar="PATH",
                    help="checkpoint film state here after each pass; resumes "
                         "automatically if the file exists and is fresh")
    pr.add_argument("--debug-nan", action="store_true",
                    help="abort on NaN in any computation (gpuErrorCheck analogue)")
    pr.set_defaults(fn=cmd_render)

    pb = sub.add_parser("bench", help="run the headline benchmark, print one JSON line")
    pb.add_argument("--width", type=int, default=512)
    pb.add_argument("--height", type=int, default=512)
    pb.add_argument("--spp", type=int, default=128)
    pb.add_argument("--bounces", type=int, default=10)
    pb.set_defaults(fn=cmd_bench)

    pf = sub.add_parser("fit", help="inverse-rendering demo (BASELINE config 5)")
    pf.add_argument("--steps", type=int, default=60)
    pf.add_argument("--out", default="fit.png")
    pf.add_argument(
        "--mesh", action="store_true",
        help="fit TRIANGLE VERTICES (anisotropic scale + translation) "
             "through the tile-BVH winner path instead of sphere params",
    )
    pf.set_defaults(fn=cmd_fit)

    pl = sub.add_parser(
        "live", help="live progressive preview with interactive camera"
    )
    pl.add_argument("--scene", help="YAML scene file (reference schema)")
    pl.add_argument("--preset", help="built-in scene preset")
    pl.add_argument("--width", type=int, default=256)
    pl.add_argument("--height", type=int, default=256)
    pl.add_argument("--bounces", type=int, default=5)
    pl.add_argument("--spp-per-frame", type=int, default=1,
                    help="samples accumulated per frame (main.cu:883)")
    pl.add_argument("--frames-per-command", type=int, default=2)
    pl.add_argument("--view", choices=("terminal", "http"),
                    default="terminal")
    pl.add_argument("--port", type=int, default=8000)
    pl.add_argument("--script", help="space-separated command script "
                    "(headless demo); default reads stdin")
    pl.set_defaults(fn=cmd_live)

    args = p.parse_args(argv)
    _apply_platform(args.platform)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
