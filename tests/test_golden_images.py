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
