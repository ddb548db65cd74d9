"""Example: build a small scene through the public API and render one frame.

The TPU-native analogue of the reference example app's raster path
(example/src/main.cpp): several models, per-slot materials, point lights,
camera, tonemap — rendered headless and written to PNG.

Usage:  python examples/render_scene.py [--size 512] [--out scene.png] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_example_scene(width: int = 512, height: int = 512):
    """The bundled example scene; returns (RenderPass, Camera)."""
    from paperrenderer_tpu import (
        Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
        make_cube, make_plane, make_torus, make_uv_sphere,
    )
    from paperrenderer_tpu.ops.shading import Lights
    from paperrenderer_tpu.render import RenderPass

    scene = Scene()
    registry = MaterialRegistry()

    ground = Model.from_mesh(scene.arena, *make_plane(size=30.0), name="ground")
    sphere = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=24, sectors=32), name="sphere"
    )
    cube = Model.from_mesh(scene.arena, *make_cube(size=1.4), name="cube")
    torus = Model.from_mesh(
        scene.arena, *make_torus(major=0.9, minor=0.32, rings=32, sides=16), name="torus"
    )

    gray = Material("gray", albedo=(0.55, 0.55, 0.6), roughness=0.9)
    red = Material("red", albedo=(0.9, 0.12, 0.1), roughness=0.35, metallic=0.0)
    gold = Material("gold", albedo=(1.0, 0.77, 0.34), roughness=0.3, metallic=1.0)
    blue = Material("blue", albedo=(0.15, 0.3, 0.9), roughness=0.15)
    glow = Material("glow", albedo=(0.1, 0.1, 0.1), emissive=(2.0, 1.2, 0.2))

    lights = Lights.make(
        [
            {"position": (4.0, -4.0, 6.0), "color": (120.0, 115.0, 100.0),
             "bounds": 60.0, "radius": 0.3},
            {"position": (-5.0, -2.0, 3.0), "color": (25.0, 35.0, 60.0), "bounds": 40.0},
        ],
        ambient=(0.6, 0.7, 1.0, 0.08),
    )

    rp = RenderPass(scene, registry, width=width, height=height, lights=lights)

    g = ModelInstance(ground)
    rp.add_instance(g, {0: gray.instance()})

    s = ModelInstance(sphere)
    s.set_transform(pos=(0.0, 0.0, 1.0))
    rp.add_instance(s, {0: red.instance()})

    c = ModelInstance(cube)
    c.set_transform(pos=(2.4, 1.2, 0.7), quat=(0.924, 0.0, 0.0, 0.383))
    rp.add_instance(c, {0: gold.instance()})

    t = ModelInstance(torus)
    t.set_transform(pos=(-2.2, 0.8, 0.5), quat=(0.793, 0.61, 0.0, 0.0))
    rp.add_instance(t, {0: blue.instance()})

    s2 = ModelInstance(sphere)
    s2.set_transform(pos=(-1.0, -2.0, 0.35), scale=0.35)
    rp.add_instance(s2, {0: glow.instance()})

    cam = Camera(yfov_deg=55.0, aspect=width / height, near=0.1, far=200.0)
    cam.look_at((0.0, -7.5, 3.6), (0.0, 0.0, 0.8), up=(0, 0, 1))
    return rp, cam


def main():
    import argparse
    import time

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--out", type=str, default="scene.png")
    parser.add_argument("--cpu", action="store_true", help="force CPU platform")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()
    import numpy as np

    from paperrenderer_tpu.io import write_png

    print("devices:", jax.devices())
    rp, cam = build_example_scene(args.size, args.size)

    t0 = time.time()
    ldr, aux = rp.render(cam)
    ldr.block_until_ready()
    t_compile = time.time() - t0

    t0 = time.time()
    n = 5
    for _ in range(n):
        ldr, aux = rp.render(cam)
    ldr.block_until_ready()
    t_steady = (time.time() - t0) / n

    print(f"first frame (incl. compile): {t_compile:.2f}s; steady: {t_steady*1e3:.1f} ms/frame")
    print(f"coverage={float(aux['coverage']):.3f} visible={int(aux['visible_count'])} tris={int(aux['total_tris'])}")
    write_png(args.out, np.asarray(ldr))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
