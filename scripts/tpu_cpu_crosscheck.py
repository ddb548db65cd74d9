"""TPU-vs-CPU image cross-check (the verify flow's parity gate).

Renders the example scenes on the REAL TPU (default platform) and compares
against the pinned CPU goldens (tests/goldens/*.png): a TPU-only numerical
regression (bf16 truncation, denormal flush, layout bug) fails here even
when the CPU suite is green. Golden tolerance bands match
tests/test_golden_images.py.

Usage: python scripts/tpu_cpu_crosscheck.py [--scenes raster,textured,rt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
SIZE = 128


def check(img, name, mean_tol=0.004, frac_tol=0.002, pix_thresh=0.06):
    from paperrenderer_tpu.io.image import read_image

    golden = read_image(
        os.path.join(GOLDEN_DIR, f"{name}.png")).astype(np.float32) / 255.0
    img = np.asarray(img, np.float32)
    diff = np.abs(img - golden).max(axis=-1)
    mean = float(diff.mean())
    frac = float((diff > pix_thresh).mean())
    ok = mean <= mean_tol and frac <= frac_tol
    print(f"{name:18s} mean|diff|={mean:.4f} frac>{pix_thresh}={frac:.4f} "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scenes", default="raster,textured,rt,hybrid,crowd,ss,big")
    args = ap.parse_args()
    import jax

    assert jax.default_backend() != "cpu", (
        "run on the TPU platform (the default) — this checks TPU==CPU")
    scenes = args.scenes.split(",")
    ok = True
    if "raster" in scenes:
        from examples.render_scene import build_example_scene

        rp, cam = build_example_scene(SIZE, SIZE)
        ok &= check(rp.render(cam)[0], "raster_example")
    if "textured" in scenes:
        from examples.render_textured import build_textured_scene

        _, _, rp, cam = build_textured_scene(SIZE, SIZE)
        ok &= check(rp.render(cam)[0], "textured_example")
    if "rt" in scenes:
        from examples.render_rt import build_rt_scene

        _, rt, cam = build_rt_scene(SIZE, SIZE)
        # RNG (threefry) is platform-identical; traversal order is not
        # bitwise, so keep the same band as the CPU golden test
        ok &= check(rt.render(cam)[0], "rt_example", mean_tol=0.01,
                    frac_tol=0.01)
    if "hybrid" in scenes:
        from examples.render_hybrid import build_hybrid_scene

        _, hy, cam = build_hybrid_scene(SIZE, SIZE)
        ok &= check(hy.render(cam)[0], "hybrid_example", mean_tol=0.01,
                    frac_tol=0.01)
    if "crowd" in scenes:
        # the REAL paged packet kernel (chunked-TLAS streaming) vs the CPU
        # golden rendered through the XLA flat view
        from examples.render_crowd import build_crowd_scene

        _, _, rtc, cam = build_crowd_scene(600, SIZE, SIZE)
        ok &= check(rtc.render(cam)[0], "crowd_paged", mean_tol=0.01,
                    frac_tol=0.01)
    if "ss" in scenes:
        from examples.render_scene import build_example_scene

        rp, cam = build_example_scene(SIZE, SIZE)
        rp.supersample = 2
        ok &= check(rp.render(cam)[0], "raster_supersample2")
    if "big" in scenes:
        from examples.render_scene import build_example_scene

        rp, cam = build_example_scene(512, 512)
        ok &= check(rp.render(cam)[0], "raster_512")
    print("CROSSCHECK", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
