"""Pinned golden-image tests (CPU-rendered, tolerance-banded).

Replaces the blind spots of the channel-mean statistics in test_golden.py
(VERDICT r2 "What's weak" #5): a subtly wrong edge function, LOD bias, or
tonemap clamp moves pixels, not means. The goldens are 128x128 PNGs under
tests/goldens/, regenerated ONLY for intentional rendering changes via
``python scripts/make_goldens.py`` (commit them with the change).

Tolerance band: 8-bit quantization (±1/255) + platform float rounding. The
pass criterion is dual — a small mean error (catches global shifts) and a
bounded fraction of pixels over a visible threshold (catches local artifacts
like seams and probe-sized errors without tripping on isolated edge-pixel
rounding).

The reference itself ships no goldens (no tests at all, SURVEY.md §4); the
scenes here are this repo's example scenes, which mirror the reference
example app's feature coverage.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
SIZE = 128


def _load(name):
    from paperrenderer_tpu.io.image import read_image

    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    assert os.path.exists(path), (
        f"missing golden {path} — run scripts/make_goldens.py")
    return read_image(path).astype(np.float32) / 255.0


def _assert_matches(img, name, *, mean_tol=0.004, frac_tol=0.002,
                    pix_thresh=0.06):
    golden = _load(name)
    img = np.asarray(img, np.float32)
    assert img.shape == golden.shape, (img.shape, golden.shape)
    diff = np.abs(img - golden).max(axis=-1)        # per-pixel max channel
    mean = float(diff.mean())
    frac_bad = float((diff > pix_thresh).mean())
    assert mean <= mean_tol, f"{name}: mean |diff| {mean:.4f} > {mean_tol}"
    assert frac_bad <= frac_tol, (
        f"{name}: {frac_bad * 100:.2f}% of pixels differ by > {pix_thresh}")


def test_raster_example_golden():
    from examples.render_scene import build_example_scene

    rp, cam = build_example_scene(SIZE, SIZE)
    ldr, _ = rp.render(cam)
    _assert_matches(ldr, "raster_example")


def test_textured_example_golden():
    from examples.render_textured import build_textured_scene

    _, _, rp, cam = build_textured_scene(SIZE, SIZE)
    ldr, _ = rp.render(cam)
    _assert_matches(ldr, "textured_example")


def test_rt_example_golden():
    from examples.render_rt import build_rt_scene

    _, rt, cam = build_rt_scene(SIZE, SIZE)
    ldr, _ = rt.render(cam)
    _assert_matches(ldr, "rt_example")


def test_hybrid_example_golden():
    from examples.render_hybrid import build_hybrid_scene

    _, hy, cam = build_hybrid_scene(SIZE, SIZE)
    ldr, _ = hy.render(cam)
    _assert_matches(ldr, "hybrid_example")


def test_crowd_paged_golden():
    """Pins the paged-tracer frame's image output (chunked-TLAS assembly;
    the CPU render uses the XLA flat view — scripts/tpu_cpu_crosscheck.py
    replays this same golden through the real paged packet kernel on TPU)."""
    from examples.render_crowd import build_crowd_scene

    _, _, rt, cam = build_crowd_scene(600, SIZE, SIZE)
    ldr, _ = rt.render(cam)
    _assert_matches(ldr, "crowd_paged")


def test_supersample2_golden():
    """Pins the ordered-SSAA path (supersample=2 + box resolve)."""
    from examples.render_scene import build_example_scene

    rp, cam = build_example_scene(SIZE, SIZE)
    rp.supersample = 2
    ldr, _ = rp.render(cam)
    _assert_matches(ldr, "raster_supersample2")


def test_raster_512_golden():
    """Pins a >=512^2 render where bin/page boundaries are exercised at a
    real tile grid (the 128^2 goldens touch only a few bins)."""
    from examples.render_scene import build_example_scene

    rp, cam = build_example_scene(512, 512)
    ldr, _ = rp.render(cam)
    _assert_matches(ldr, "raster_512")


def test_sharded_raster_golden():
    """Pins one sharded frame (8 virtual CPU devices, screen-tile mesh)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from examples.render_scene import build_example_scene
    from paperrenderer_tpu.ops.static_batch import build_static_mapping
    from paperrenderer_tpu.parallel.mesh import make_tile_mesh
    from paperrenderer_tpu.parallel.tiles import sharded_render_frame_static

    rp, cam = build_example_scene(SIZE, SIZE)
    mesh = make_tile_mesh()
    arrays = rp.scene.flush()
    slots, visible, table = rp._device_inputs(arrays.capacity)
    mapping = build_static_mapping(rp.scene)
    ldr = sharded_render_frame_static(
        mesh, mapping, arrays, rp.scene.tables(), table, rp.lights,
        cam.matrices, slots, visible, rp.tonemap_params,
        width=SIZE, height=SIZE,
    )
    _assert_matches(ldr, "sharded_raster")
