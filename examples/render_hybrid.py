"""Example: hybrid frame — raster G-buffer + RT shadows/AO/reflections.

Usage: python examples/render_hybrid.py [--size 256] [--out hybrid.png] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_hybrid_scene(width=256, height=256):
    from paperrenderer_tpu import (
        Camera, Material, Model, ModelInstance, RenderEngine,
        make_cube, make_plane, make_uv_sphere,
    )
    from paperrenderer_tpu.ops.shading import Lights

    eng = RenderEngine(device_check=False)
    ground = Model.from_mesh(eng.scene.arena, *make_plane(size=30.0), name="ground")
    sphere = Model.from_mesh(
        eng.scene.arena, *make_uv_sphere(radius=1.0, rings=20, sectors=28), name="sphere"
    )
    cube = Model.from_mesh(eng.scene.arena, *make_cube(size=1.4), name="cube")

    hy = eng.create_hybrid_render(
        width=width, height=height,
        lights=Lights.make(
            [
                {"position": (4.0, -4.0, 7.0), "color": (160.0, 150.0, 130.0),
                 "bounds": 60.0, "radius": 0.4},
                {"position": (-6.0, -3.0, 4.0), "color": (40.0, 45.0, 60.0),
                 "bounds": 40.0, "cast_shadow": False},
            ],
            ambient=(0.6, 0.7, 1.0, 0.25),
        ),
        shadow_samples=2, reflection_samples=1, ao_samples=2, ao_radius=2.0,
    )
    white = Material("white", albedo=(0.75, 0.75, 0.78), roughness=0.85)
    red = Material("red", albedo=(0.85, 0.1, 0.08), roughness=0.3)
    mirror = Material("mirror", albedo=(0.95, 0.95, 0.95), roughness=0.05, metallic=1.0)

    g = ModelInstance(ground)
    hy.add_instance(g, {0: white.instance()})
    s = ModelInstance(sphere)
    s.set_transform(pos=(-0.9, 0.3, 1.0))
    hy.add_instance(s, {0: red.instance()})
    c = ModelInstance(cube)
    c.set_transform(pos=(1.5, 0.8, 0.7), quat=(0.924, 0.0, 0.0, 0.383))
    hy.add_instance(c, {0: mirror.instance()})

    cam = Camera(yfov_deg=55.0, aspect=width / height, near=0.1, far=200.0)
    cam.look_at((0.0, -6.5, 3.2), (0.0, 0.0, 0.7), up=(0, 0, 1))
    return eng, hy, cam


def main():
    import argparse
    import time

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--out", type=str, default="hybrid.png")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()

    import numpy as np

    from paperrenderer_tpu.io import write_png

    eng, hy, cam = build_hybrid_scene(args.size, args.size)
    t0 = time.time()
    ldr, aux = hy.render(cam)
    ldr.block_until_ready()
    print(f"first frame: {time.time()-t0:.1f}s  coverage={float(aux['coverage']):.3f}")
    t0 = time.time()
    for _ in range(3):
        ldr, aux = hy.render(cam)
    ldr.block_until_ready()
    print(f"steady: {(time.time()-t0)/3*1e3:.1f} ms/frame")
    write_png(args.out, np.asarray(ldr))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
