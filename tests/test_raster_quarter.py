"""Quarter-tile raster path vs the classic full-tile path.

QUARTER_DEFAULT=True means the whole suite exercises the quarter kernel;
this file keeps the CLASSIC path covered and pins the cross-path contract:
identical coverage and identical quantized depth keys everywhere, with tid
divergence allowed only at quantized-depth TIES (each path breaks ties by
its own deterministic slot order — classic by step-slot, quarter by
(round, lane)). Runs both kernels in interpreter mode (CPU suite).
"""

import numpy as np
import pytest

from paperrenderer_tpu.core import (
    Camera, Model, ModelInstance, Scene, make_cube, make_uv_sphere,
)
from paperrenderer_tpu.ops import preprocess as P
from paperrenderer_tpu.ops import raster as R
from paperrenderer_tpu.ops import raster_exact as RE


@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setattr(RE, "INTERPRET", True)


@pytest.fixture(scope="module")
def batch_and_cam():
    scene = Scene(use_native=False)
    sphere = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=10, sectors=14))
    cube = Model.from_mesh(scene.arena, *make_cube())
    rng = np.random.default_rng(7)
    for i in range(12):
        inst = ModelInstance(sphere if i % 2 == 0 else cube)
        s = float(rng.uniform(0.3, 1.2))
        inst.set_transform(pos=rng.uniform(-4, 4, 3).tolist(),
                           scale=(s, s, s))
        scene.add_instance(inst)
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.05, far=100.0)
    cam.look_at((0.0, -9.0, 2.0), (0.0, 0.0, 0.0), up=(0, 0, 1))
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod,
    )
    batch = R.build_triangle_batch(
        pre, scene.geometry(), cam.matrices, capacity=4096)
    return batch, cam


def _keys(depth: np.ndarray) -> np.ndarray:
    return depth.view(np.int32) & ~np.int32(RE.C - 1)


def test_quarter_matches_classic(interpret_kernel, batch_and_cam):
    batch, _ = batch_and_cam
    w = h = 128
    d_c, t_c, _, _ = RE.rasterize_exact(batch, w, h, quarter=False)
    d_q, t_q, _, _ = RE.rasterize_exact(batch, w, h, quarter=True)
    d_c, t_c = np.asarray(d_c), np.asarray(t_c)
    d_q, t_q = np.asarray(d_q), np.asarray(t_q)

    cov_c, cov_q = t_c >= 0, t_q >= 0
    np.testing.assert_array_equal(cov_c, cov_q)
    finite = np.isfinite(d_c)
    np.testing.assert_array_equal(_keys(d_c)[finite], _keys(d_q)[finite])
    mism = t_c != t_q
    # tid may differ only where the quantized keys tie
    assert (_keys(d_c)[mism] == _keys(d_q)[mism]).all()


def test_crossz_matches_divide_scheme(interpret_kernel, batch_and_cam):
    """The cross-multiplied (zn, wn) winner state == the divided-key scheme:
    identical coverage, same quantized depth buckets, tid divergence only at
    bucket ties — and crossz depth must be EXACT (zn/wn), i.e. within one
    quantization step of the divided path's masked depth."""
    batch, _ = batch_and_cam
    w = h = 128
    d_d, t_d, _, _ = RE.rasterize_exact(batch, w, h, quarter=True,
                                        crossz=False)
    d_x, t_x, _, _ = RE.rasterize_exact(batch, w, h, quarter=True,
                                        crossz=True)
    d_d, t_d = np.asarray(d_d), np.asarray(t_d)
    d_x, t_x = np.asarray(d_x), np.asarray(t_x)
    np.testing.assert_array_equal(t_d >= 0, t_x >= 0)
    fin = np.isfinite(d_d)
    np.testing.assert_array_equal(_keys(d_d)[fin], _keys(d_x)[fin])
    mism = t_d != t_x
    assert (_keys(d_d)[mism] == _keys(d_x)[mism]).all()
    # exact depth sits inside its own quantization bucket
    cov = t_x >= 0
    assert (d_x[cov] >= d_d[cov]).all()  # masked depth is a floor


def test_crossz_big_world_scale(interpret_kernel):
    """crossz ordering survives km-scale worlds: raw adjugate depth rows
    grow ~pix^2 * w^3 and the cross-multiplied compare (zn_a * wn_b) would
    overflow f32 without triangle_coefficients' power-of-two depth-row
    normalization (ratio- and order-invariant, so the divide scheme pins
    the expected result)."""
    S = 50000.0   # 50000x world scale: raw zn*wn products overflow to inf
    scene = Scene(use_native=False)
    cube = Model.from_mesh(scene.arena, *make_cube())
    # a far-to-near stack of cubes on the view axis: every covered pixel has
    # real depth competition, and the FAR cubes are added first so a broken
    # compare (inf < inf -> never replace the first accepted candidate)
    # visibly picks the wrong winner
    for k in range(6):
        inst = ModelInstance(cube)
        inst.set_transform(pos=(0.0, (5 - k) * 2.0 * S, 0.0),
                           scale=(1.5 * S, 1.5 * S, 1.5 * S))
        scene.add_instance(inst)
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.05 * S, far=100.0 * S)
    cam.look_at((0.0, -9.0 * S, 2.0 * S), (0.0, 0.0, 0.0), up=(0, 0, 1))
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod,
    )
    batch = R.build_triangle_batch(
        pre, scene.geometry(), cam.matrices, capacity=4096)
    w = h = 128
    d_d, t_d, _, _ = RE.rasterize_exact(batch, w, h, quarter=True,
                                        crossz=False)
    d_x, t_x, _, _ = RE.rasterize_exact(batch, w, h, quarter=True,
                                        crossz=True)
    d_d, t_d = np.asarray(d_d), np.asarray(t_d)
    d_x, t_x = np.asarray(d_x), np.asarray(t_x)
    assert (t_x >= 0).any(), "big-world fixture renders nothing"
    np.testing.assert_array_equal(t_d >= 0, t_x >= 0)
    fin = np.isfinite(d_d)
    np.testing.assert_array_equal(_keys(d_d)[fin], _keys(d_x)[fin])
    mism = t_d != t_x
    assert (_keys(d_d)[mism] == _keys(d_x)[mism]).all()


def test_quarter_matches_classic_peel(interpret_kernel, batch_and_cam):
    import jax.numpy as jnp

    batch, _ = batch_and_cam
    w = h = 128
    d1, t1, _, _ = RE.rasterize_exact(batch, w, h, quarter=False)
    floor = RE.depth_to_key(jnp.where(jnp.isfinite(d1), d1, -1.0))
    ceil = jnp.full((h, w), RE.SENTINEL, jnp.int32)
    d_c, t_c, _, _ = RE.rasterize_exact(
        batch, w, h, quarter=False, depth_window=(floor, ceil),
        overflow_cond=False)
    d_q, t_q, _, _ = RE.rasterize_exact(
        batch, w, h, quarter=True, depth_window=(floor, ceil),
        overflow_cond=False)
    t_c, t_q = np.asarray(t_c), np.asarray(t_q)
    d_c, d_q = np.asarray(d_c), np.asarray(d_q)
    np.testing.assert_array_equal(t_c >= 0, t_q >= 0)
    mism = t_c != t_q
    assert (_keys(d_c)[mism] == _keys(d_q)[mism]).all()


def test_quarter_window_matches_full(interpret_kernel, batch_and_cam):
    """Sharded-window rendering (origin offset) == the same rows of the
    full-viewport quarter render, bitwise."""
    batch, _ = batch_and_cam
    w = h = 128
    _, t_full, _, _ = RE.rasterize_exact(batch, w, h, quarter=True)
    _, t_win, _, _ = RE.rasterize_exact(
        batch, 128, 64, quarter=True,
        full_width=w, full_height=h, origin=(0, 64))
    np.testing.assert_array_equal(
        np.asarray(t_win), np.asarray(t_full)[64:, :])


def test_quarter_overflow_required_grows(interpret_kernel, batch_and_cam):
    """The quarter path's demand scalar covers its own layout: re-running at
    the returned capacity reproduces the full image (overflow contract)."""
    batch, _ = batch_and_cam
    w = h = 128
    d0, t0, _, req = RE.rasterize_exact(batch, w, h, quarter=True)
    cap = int(-(-int(req) // RE.BP) * RE.BP)
    d1, t1, _, req1 = RE.rasterize_exact(
        batch, w, h, quarter=True, pair_capacity=cap, overflow_cond=False)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    assert int(req1) <= cap
