"""Example: textured materials through the full pipeline.

Procedural checker/gradient images become baseColor / emissive /
metallicRoughness / occlusion textures (the reference Image + combined
sampler path, VulkanResources.cpp:640-1003), packed into the shared atlas
and sampled with mip selection in the deferred shade.

Usage:  python examples/render_textured.py [--size 512] [--out textured.png]
        [--rt] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _checker(n, c0, c1, tiles=8):
    img = np.zeros((n, n, 3), np.uint8)
    ii, jj = np.meshgrid(range(n), range(n), indexing="ij")
    sel = ((ii * tiles // n) + (jj * tiles // n)) % 2 == 1
    img[~sel] = c0
    img[sel] = c1
    return img


def _gradient(n):
    img = np.zeros((n, n, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, n, dtype=np.uint8)[None, :]
    img[..., 2] = np.linspace(255, 0, n, dtype=np.uint8)[:, None]
    return img


def build_textured_scene(width=512, height=512):
    from paperrenderer_tpu import (
        Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
        make_cube, make_plane, make_uv_sphere,
    )
    from paperrenderer_tpu.ops.shading import Lights
    from paperrenderer_tpu.render import RenderPass

    scene = Scene()
    registry = MaterialRegistry()

    ground = Model.from_mesh(scene.arena, *make_plane(size=24.0), name="ground")
    sphere = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=24, sectors=32),
        name="sphere")
    cube = Model.from_mesh(scene.arena, *make_cube(size=1.4), name="cube")

    # mr map: horizontal roughness ramp (g), vertical metallic ramp (b)
    mr = np.zeros((64, 64, 3), np.uint8)
    mr[..., 1] = np.linspace(30, 255, 64, dtype=np.uint8)[None, :]
    mr[..., 2] = np.linspace(255, 0, 64, dtype=np.uint8)[:, None]

    floor_mat = Material(
        "checker-floor", albedo=(1, 1, 1), roughness=0.8,
        base_texture=_checker(128, (40, 40, 46), (200, 200, 210), tiles=16),
    )
    ball_mat = Material(
        "gradient-ball", albedo=(1, 1, 1), roughness=0.4,
        base_texture=_gradient(64), mr_texture=mr,
    )
    glow_mat = Material(
        "glow-cube", albedo=(0.2, 0.2, 0.2), roughness=0.6,
        emissive_texture=_checker(32, (0, 0, 0), (255, 140, 0), tiles=4),
    )

    rp = RenderPass(
        scene, registry, width=width, height=height,
        lights=Lights.make(
            [{"position": (4.0, -5.0, 7.0), "color": (120.0, 115.0, 105.0),
              "bounds": 60.0, "radius": 0.3}],
            ambient=(0.6, 0.7, 1.0, 0.25),
        ),
    )
    rp.add_instance(ModelInstance(ground), {0: floor_mat.instance()})
    s = ModelInstance(sphere)
    s.set_transform(pos=(-1.1, 0.4, 1.0))
    rp.add_instance(s, {0: ball_mat.instance()})
    c = ModelInstance(cube)
    c.set_transform(pos=(1.4, 0.9, 0.7), quat=(0.924, 0.0, 0.0, 0.383))
    rp.add_instance(c, {0: glow_mat.instance()})

    cam = Camera(yfov_deg=55.0, aspect=width / height, near=0.1, far=200.0)
    cam.look_at((0.0, -6.0, 3.0), (0.0, 0.0, 0.7), up=(0, 0, 1))
    return scene, registry, rp, cam


def main():
    import argparse
    import time

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--out", type=str, default="textured.png")
    parser.add_argument("--rt", action="store_true",
                        help="ray-traced path instead of raster")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()

    from paperrenderer_tpu.io import write_png

    scene, registry, rp, cam = build_textured_scene(args.size, args.size)
    if args.rt:
        from paperrenderer_tpu.render import RayTraceRender

        render = RayTraceRender(
            scene, registry, width=args.size, height=args.size,
            lights=rp.lights, shadow_samples=1, reflection_samples=1,
            ao_samples=1,
        )
        # bind the same per-instance materials in the RT pass
        for inst in scene.instances:
            binds = rp._bindings.get(inst.index, {})
            render._tlas_bindings[0][inst.index] = dict(binds)
        render._cache_dirty = True
    else:
        render = rp

    t0 = time.time()
    ldr, aux = render.render(cam)
    ldr.block_until_ready()
    print(f"first frame (incl. compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(5):
        ldr, aux = render.render(cam)
    ldr.block_until_ready()
    print(f"steady: {(time.time()-t0)/5*1e3:.1f} ms/frame")
    write_png(args.out, np.asarray(ldr))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
