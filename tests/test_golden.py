"""Golden-statistics regression test for the bundled example scene.

The reference has no golden images (no tests at all); this pins our own
round-1 output statistics so rendering regressions are caught. Statistics
(not pixels) keep the test robust to platform rounding while still failing
on real changes (coverage, lighting, materials, tonemap).
"""

import numpy as np
import pytest

from examples.render_scene import build_example_scene


@pytest.fixture(scope="module")
def example_frame():
    rp, cam = build_example_scene(128, 128)
    ldr, aux = rp.render(cam)
    return np.asarray(ldr), aux


def test_example_scene_coverage(example_frame):
    img, aux = example_frame
    assert float(aux["coverage"]) == pytest.approx(0.69, abs=0.03)
    assert int(aux["visible_count"]) == 5
    assert int(aux["total_tris"]) == 4110


def test_example_scene_channel_statistics(example_frame):
    img, _ = example_frame
    mean = img.mean(axis=(0, 1))
    # round-1 pinned values (CPU & TPU agree to ~1e-3)
    np.testing.assert_allclose(mean, [0.392, 0.379, 0.406], atol=0.02)
    assert img.std() == pytest.approx(0.334, abs=0.03)


def test_example_scene_object_colors(example_frame):
    img, _ = example_frame
    h = img.shape[0]
    # probe object centers (128x128 layout of the example scene)
    sphere = img[int(0.45 * h), int(0.5 * h)]
    torus = img[int(0.45 * h), int(0.24 * h)]
    cube = img[int(0.45 * h), int(0.75 * h)]
    glow = img[int(0.66 * h), int(0.34 * h)]
    assert sphere[0] > sphere[1] and sphere[0] > sphere[2]      # red
    assert torus[2] > torus[0]                                   # blue
    assert cube[0] > cube[2] and cube[1] > cube[2]               # gold-ish
    assert glow[0] > 0.3 and glow[1] > 0.2 and glow[0] > glow[2]  # warm glow
