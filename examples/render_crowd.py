"""Example: many-instance ray-traced crowd (chunked-TLAS paging showcase).

10k+ instances traced through the paged packet kernels
(ops/trace_paged.py): the TLAS is streamed HBM->SMEM per chunk visit, so
traced scene size is HBM-bound like the reference's driver TLAS
(AccelerationStructure.cpp:479-616) instead of SMEM-bound.

Usage: python examples/render_crowd.py [--n 10000] [--size 512] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_crowd_scene(n_inst=10000, width=512, height=512, seed=0):
    """n_inst spheres/cubes uniformly in a cube, one RayTraceRender."""
    from paperrenderer_tpu.core import (
        Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
        make_cube, make_uv_sphere,
    )
    from paperrenderer_tpu.ops.shading import Lights
    from paperrenderer_tpu.render import RayTraceRender

    rng = np.random.default_rng(seed)
    scene = Scene()
    registry = MaterialRegistry()
    sphere = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=0.5, rings=6, sectors=8))
    cube = Model.from_mesh(scene.arena, *make_cube(size=0.7))
    side = max(4.0, float(n_inst) ** (1 / 3) * 1.3)
    rt = RayTraceRender(
        scene, registry, width=width, height=height,
        lights=Lights.make(
            [{"position": (0.0, -3.0 * side, 2.0 * side),
              "color": (40.0 * side ** 2, 38.0 * side ** 2, 34.0 * side ** 2),
              "bounds": 10.0 * side}],
            ambient=(0.6, 0.7, 1.0, 0.3),
        ),
        shadow_samples=1, reflection_samples=0, ao_samples=0,
    )
    red = Material("red", albedo=(0.8, 0.2, 0.2), roughness=0.5)
    blue = Material("blue", albedo=(0.2, 0.2, 0.8), roughness=0.5)
    for i in range(n_inst):
        m = ModelInstance(sphere if i % 2 == 0 else cube)
        m.set_transform(pos=tuple(rng.uniform(-side, side, 3)))
        rt.add_instance(m, {0: (red if i % 2 else blue).instance()})
    cam = Camera(yfov_deg=60.0, aspect=width / height, near=0.1, far=1000.0)
    cam.look_at((0.0, -2.6 * side, 1.2 * side), (0, 0, 0), up=(0, 0, 1))
    return scene, registry, rt, cam


def main():
    import argparse
    import time

    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10000)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--out", type=str, default="crowd.png")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()

    from paperrenderer_tpu.io import write_png

    scene, registry, rt, cam = build_crowd_scene(args.n, args.size, args.size)
    t0 = time.time()
    ldr, _ = rt.render(cam)
    ldr.block_until_ready()
    print(f"first frame (incl. compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        ldr, _ = rt.render(cam)
    ldr.block_until_ready()
    print(f"steady: {(time.time() - t0) / 3 * 1e3:.1f} ms/frame")
    write_png(args.out, np.asarray(ldr))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
