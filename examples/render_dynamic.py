"""Example/benchmark: dynamic instanced scene (BASELINE config 2/5 style).

N instances animated ON DEVICE every frame (zero host per-instance cost — the
TPU answer to the reference's GPU-driven claim), rendered through the full
preprocess -> Pallas raster -> shade -> tonemap pipeline.

Usage: python examples/render_dynamic.py [--n 10000] [--width 1920]
           [--height 1080] [--frames 20] [--out dynamic.png] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_dynamic_scene(n_instances: int, width: int, height: int, seed: int = 0):
    import numpy as np

    from paperrenderer_tpu import (
        Camera, Material, Model, ModelInstance, RenderEngine, make_cube,
        make_icosphere,
    )
    from paperrenderer_tpu.ops.shading import Lights

    eng = RenderEngine(device_check=False)
    cube = Model.from_mesh(eng.scene.arena, *make_cube(size=0.5), name="cube")
    ball = Model.from_mesh(
        eng.scene.arena, *make_icosphere(radius=0.3, subdivisions=1), name="ball"
    )

    rp = eng.create_render_pass(
        width=width, height=height,
        lights=Lights.make(
            [{"position": (0.0, -30.0, 60.0), "color": (5000.0, 4800.0, 4500.0),
              "bounds": 500.0}],
            ambient=(0.7, 0.8, 1.0, 0.15),
        ),
    )
    mats = [
        Material("a", albedo=(0.9, 0.2, 0.15), roughness=0.5),
        Material("b", albedo=(0.2, 0.5, 0.9), roughness=0.4),
        Material("c", albedo=(0.95, 0.8, 0.3), roughness=0.3, metallic=1.0),
        Material("d", albedo=(0.3, 0.85, 0.4), roughness=0.7),
    ]
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n_instances)))
    spacing = 1.2
    for k in range(n_instances):
        model = cube if k % 2 == 0 else ball
        inst = ModelInstance(model)
        x = (k % side - side / 2) * spacing
        y = (k // side - side / 2) * spacing + 40.0
        z = rng.uniform(0.0, 2.0)
        inst.set_transform(pos=(x, y, z))
        rp.add_instance(inst, {0: mats[k % 4].instance()})
    cam = Camera(yfov_deg=70.0, aspect=width / height, near=0.1, far=500.0)
    cam.look_at((0.0, -side * 0.35, side * 0.35), (0.0, 40.0, 0.0), up=(0, 0, 1))
    return eng, rp, cam


def run(n_instances=10000, width=1920, height=1080, frames=20, out=None):
    """Animated loop; returns (ms_per_frame, last_frame_ldr)."""
    import time

    import jax
    import jax.numpy as jnp

    from paperrenderer_tpu.ops.animation import animate_instances
    from paperrenderer_tpu.render.renderpass import render_frame_static

    eng, rp, cam = build_dynamic_scene(n_instances, width, height)
    arrays = eng.begin_frame()
    slots, visible, table = rp._device_inputs(arrays.capacity)
    mapping = rp._current_mapping()
    tables = eng.scene.tables()
    cm = cam.matrices

    # one probe frame to size the raster work queue (overflow growth)
    _ldr, aux = rp.render(cam)
    work_cap = rp._work_capacity

    # NOTE: big device arrays must be ARGUMENTS, not closures — closed-over
    # arrays are baked into the HLO as constants (the remote compiler rejects
    # 100k-instance modules with >100MB of embedded mapping data).
    @jax.jit
    def frame(mapping, tables, table, slots, visible, arrays, t):
        arrays = animate_instances(arrays, t)
        ldr, aux = render_frame_static(
            mapping, arrays, tables, table, rp.lights, cm,
            slots, visible, rp.tonemap_params,
            width=width, height=height, do_culling=True,
            use_pallas=rp.use_pallas, work_capacity=work_cap,
        )
        return arrays, ldr, aux

    import functools
    frame = functools.partial(frame, mapping, tables, table, slots, visible)

    t0 = time.time()
    arrays, ldr, aux = frame(arrays, jnp.float32(0.0))
    ldr.block_until_ready()
    compile_s = time.time() - t0

    t0 = time.perf_counter()
    for i in range(frames):
        arrays, ldr, aux = frame(arrays, jnp.float32(0.05 * (i + 1)))
    ldr.block_until_ready()
    ms = (time.perf_counter() - t0) / frames * 1e3
    return ms, compile_s, ldr, aux


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10000)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--frames", type=int, default=20)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()

    ms, compile_s, ldr, aux = run(args.n, args.width, args.height, args.frames)
    print(
        f"n={args.n} {args.width}x{args.height}: {ms:.2f} ms/frame "
        f"({1000.0/ms:.1f} fps), compile {compile_s:.1f}s, "
        f"visible={int(aux['visible_count'])} tris={int(aux['total_tris'])} "
        f"coverage={float(aux['coverage']):.3f}"
    )
    if args.out:
        import numpy as np

        from paperrenderer_tpu.io import write_png

        write_png(args.out, np.asarray(ldr))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
