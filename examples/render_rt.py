"""Example: pure ray-traced frame (RayTraceRender — the reference's RT path).

Usage: python examples/render_rt.py [--size 192] [--out rt.png] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_rt_scene(width=192, height=192):
    from paperrenderer_tpu import (
        Camera, Material, Model, ModelInstance, RenderEngine,
        make_cube, make_plane, make_uv_sphere,
    )
    from paperrenderer_tpu.ops.shading import Lights

    eng = RenderEngine(device_check=False)
    ground = Model.from_mesh(eng.scene.arena, *make_plane(size=30.0))
    sphere = Model.from_mesh(
        eng.scene.arena, *make_uv_sphere(radius=1.0, rings=16, sectors=24)
    )
    cube = Model.from_mesh(eng.scene.arena, *make_cube(size=1.4))

    rt = eng.create_ray_trace_render(
        width=width, height=height,
        lights=Lights.make(
            [
                {"position": (4.0, -4.0, 7.0), "color": (160.0, 150.0, 130.0),
                 "bounds": 60.0, "radius": 0.4},
            ],
            ambient=(0.6, 0.7, 1.0, 0.3),
        ),
        shadow_samples=2, reflection_samples=1, ao_samples=1, ao_radius=2.0,
    )
    white = Material("white", albedo=(0.75, 0.75, 0.78), roughness=0.9)
    red = Material("red", albedo=(0.85, 0.1, 0.08), roughness=0.3)
    gold = Material("gold", albedo=(1.0, 0.78, 0.35), roughness=0.15, metallic=1.0)
    g = ModelInstance(ground)
    rt.add_instance(g, {0: white.instance()})
    s = ModelInstance(sphere)
    s.set_transform(pos=(-0.9, 0.3, 1.0))
    rt.add_instance(s, {0: red.instance()})
    c = ModelInstance(cube)
    c.set_transform(pos=(1.5, 0.8, 0.7), quat=(0.924, 0.0, 0.0, 0.383))
    rt.add_instance(c, {0: gold.instance()})
    cam = Camera(yfov_deg=55.0, aspect=width / height, near=0.1, far=200.0)
    cam.look_at((0.0, -6.5, 3.2), (0.0, 0.0, 0.7), up=(0, 0, 1))
    return eng, rt, cam


def main():
    import argparse
    import time

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=192)
    parser.add_argument("--out", type=str, default="rt.png")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()

    import numpy as np

    from paperrenderer_tpu.io import write_png

    eng, rt, cam = build_rt_scene(args.size, args.size)
    t0 = time.time()
    ldr, aux = rt.render(cam)
    ldr.block_until_ready()
    print(f"first frame: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        ldr, aux = rt.render(cam)
    ldr.block_until_ready()
    print(f"steady: {(time.time()-t0)/3*1e3:.1f} ms/frame")
    write_png(args.out, np.asarray(ldr))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
