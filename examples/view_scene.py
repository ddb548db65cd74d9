"""Serve the example scene through the live HTTP viewer.

The headless analogue of the reference example's windowed loop
(example/src/main.cpp frame loop + GuiRender.cpp ImGui panel): streams
frames at whatever rate the device sustains and exposes material sliders,
a raster<->RT mode switch, camera moves, and per-frame statistics at
http://HOST:PORT (default 127.0.0.1:8080).

    python examples/view_scene.py --size 256 [--rt] [--frames 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--rt", action="store_true",
                   help="also register the pure-RT mode (slower first compile)")
    p.add_argument("--frames", type=int, default=0,
                   help="exit after N frames (0 = run until Ctrl-C)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()

    from examples.render_scene import build_example_scene
    from paperrenderer_tpu import StatisticsTracker, Viewer

    stats = StatisticsTracker()
    rp, cam = build_example_scene(args.size, args.size)
    renders = {"raster": rp}
    if args.rt:
        # raster<->RT toggle over the SAME scene (GuiRender.cpp:79-87)
        from paperrenderer_tpu.render import RayTraceRender

        rt = RayTraceRender(rp.scene, rp.materials,
                            width=args.size, height=args.size,
                            lights=rp.lights, shadow_samples=2)
        rt.add_instances_from(rp)
        renders["rt"] = rt

    v = Viewer(renders, cam, host=args.host, port=args.port,
               statistics=stats).start()
    print(f"viewer at {v.url} (modes: {', '.join(renders)})", flush=True)
    try:
        if args.frames:
            v.wait_frame(args.frames, timeout=3600)
        else:
            while True:
                time.sleep(1)
    except KeyboardInterrupt:
        pass
    finally:
        v.stop()
    s = v.snapshot_stats()
    print(f"served {s['frame']} frames at ~{s['fps']:.1f} fps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
