"""Work-queue overflow guard: no frame ships with silently dropped triangles.

The binned rasterizer's pair capacity depends on the CAMERA (triangle-tile
overlap), so a camera move after warm-up can exceed it. The guard is
two-layered: a lax.cond in-graph fallback re-bins at 2x capacity the same
frame, and the host grows the persistent capacity off the returned demand
scalar (reference buffer-growth contract, PaperRenderer.cpp:208-212).

Runs the Pallas kernel in interpreter mode (CPU test environment).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.core import (
    Camera, Model, ModelInstance, Scene, make_uv_sphere,
)
from paperrenderer_tpu.ops import raster as R
from paperrenderer_tpu.ops import raster_exact as RE
from paperrenderer_tpu.ops import preprocess as P


@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setattr(RE, "INTERPRET", True)


def _batch(scene, cam, tri_capacity=1024):
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod,
    )
    return R.build_triangle_batch(
        pre, scene.geometry(), cam.matrices, capacity=tri_capacity
    )


def _cam(dist):
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.05, far=100.0)
    cam.look_at((0.0, -dist, 0.0), (0.0, 0.0, 0.0), up=(0, 0, 1))
    return cam


def test_overflow_cond_keeps_frame_complete(interpret_kernel):
    """Warm up far away (small demand), then move the camera so close that
    every triangle spans many tiles: demand exceeds the warm-up capacity and
    the in-graph 2x fallback must keep coverage exact."""
    scene = Scene(use_native=False)
    model = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=10, sectors=14))
    scene.add_instance(ModelInstance(model))
    w = h = 128

    far_cam = _cam(12.0)
    batch_far = _batch(scene, far_cam)
    _, _, _, req_far = RE.rasterize_exact(batch_far, w, h)
    cap = int(-(-int(req_far) // RE.BP) * RE.BP)

    near_cam = _cam(1.35)   # sphere fills the frame; tris span many tiles
    batch_near = _batch(scene, near_cam)
    # exact reference (pure XLA rasterizer)
    depth_ref, tid_ref, _ = R.rasterize(batch_near, w, h)

    depth, tid, _, required = RE.rasterize_exact(
        batch_near, w, h, pair_capacity=cap)
    req = int(required)
    assert req > cap, "test must actually overflow the warm-up capacity"
    assert req <= 4 * cap, "fallback branch must cover this overflow"

    cov = np.asarray(tid >= 0)
    cov_ref = np.asarray(tid_ref >= 0)
    # full coverage: no dropped-triangle holes (tiny edge tie-break diffs ok)
    assert (cov != cov_ref).mean() < 0.002
    d = np.asarray(depth)
    d_ref = np.asarray(depth_ref)
    both = cov & cov_ref
    np.testing.assert_allclose(d[both], d_ref[both], rtol=1e-3, atol=1e-3)


def test_overflow_without_cond_drops(interpret_kernel):
    """Sanity: with the cond fallback disabled the same overflow DOES drop
    coverage — proving the guard is what keeps the frame complete."""
    scene = Scene(use_native=False)
    model = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=10, sectors=14))
    scene.add_instance(ModelInstance(model))
    w = h = 128

    batch_far = _batch(scene, _cam(12.0))
    _, _, _, req_far = RE.rasterize_exact(batch_far, w, h)
    cap = int(-(-int(req_far) // RE.BP) * RE.BP)

    batch_near = _batch(scene, _cam(1.35))
    _, tid_ref, _ = R.rasterize(batch_near, w, h)[:3]
    _, tid, _, required = RE.rasterize_exact(
        batch_near, w, h, pair_capacity=cap, overflow_cond=False)
    assert int(required) > cap
    cov = np.asarray(tid >= 0)
    cov_ref = np.asarray(tid_ref >= 0)
    assert (cov != cov_ref).mean() > 0.01


def test_beyond_4x_spike_degrades_one_frame_and_recovers(interpret_kernel):
    """Pin the contract past the in-graph fallback's reach: a single-frame
    demand spike beyond 4x capacity (extreme camera teleport on a stale
    capacity) ships THAT frame with dropped fragments — never a crash — and
    the returned demand scalar grows the next frame back to complete
    coverage (the reference's buffer-growth contract,
    PaperRenderer.cpp:208-212, amortized across one frame)."""
    scene = Scene(use_native=False)
    model = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=10, sectors=14))
    scene.add_instance(ModelInstance(model))
    w = h = 128

    batch_near = _batch(scene, _cam(1.35))
    _, _, _, full = RE.rasterize_exact(batch_near, w, h)
    # capacity so stale that demand > 4x: the cond fallback cannot cover it
    tiny = RE.BP
    assert int(full) > 4 * tiny

    depth, tid, _, required = RE.rasterize_exact(
        batch_near, w, h, pair_capacity=tiny)
    _, tid_ref, _ = R.rasterize(batch_near, w, h)
    cov = np.asarray(tid >= 0)
    cov_ref = np.asarray(tid_ref >= 0)
    # frame 1: degraded (dropped fragments), finite, and demand reported
    assert (cov != cov_ref).mean() > 0.01
    assert np.isfinite(np.asarray(depth)[cov]).all()
    assert int(required) >= int(full) // 2

    # frame 2: grow to the reported demand -> complete coverage again
    grown = int(-(-int(required) * 5 // 4 // RE.BP) * RE.BP)
    _, tid2, _, _ = RE.rasterize_exact(
        batch_near, w, h, pair_capacity=grown)
    cov2 = np.asarray(tid2 >= 0)
    assert (cov2 != cov_ref).mean() < 0.002


def test_required_reports_raw_pair_overflow(interpret_kernel):
    """When even the pair expansion overflows (n_pairs > capacity), the
    returned demand must still reflect it so callers grow correctly."""
    scene = Scene(use_native=False)
    model = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=10, sectors=14))
    scene.add_instance(ModelInstance(model))
    w = h = 128
    batch = _batch(scene, _cam(1.35))
    tiny = 4 * RE.BP
    _, _, _, required = RE.rasterize_exact(
        batch, w, h, pair_capacity=tiny, overflow_cond=False)
    # true demand at generous capacity
    _, _, _, full = RE.rasterize_exact(batch, w, h)
    assert int(required) >= int(full) // 2  # n_pairs-level signal survives
    assert int(required) > tiny


@pytest.mark.parametrize("quarter", [True, False])
def test_measure_pair_demand_matches_pipeline(interpret_kernel, quarter):
    """The capacity probe (measure_pair_demand: corner-scatter histogram,
    no sort/kernel) must report exactly the demand the full pipeline
    returns at sufficient capacity — RenderPass sizes its work capacity
    from the probe BEFORE compiling the raster program."""
    scene = Scene(use_native=False)
    model = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=10, sectors=14))
    for k in range(3):
        inst = ModelInstance(model)
        inst.set_transform(pos=(0.8 * k - 0.8, 0.0, 0.3 * k))
        scene.add_instance(inst)
    w = h = 128
    for dist in (1.35, 4.0, 12.0):
        batch = _batch(scene, _cam(dist), tri_capacity=2048)
        probe = int(RE.measure_pair_demand(batch, w, h, quarter=quarter))
        _, _, _, required = RE.rasterize_exact(
            batch, w, h, quarter=quarter, overflow_cond=False)
        assert probe == int(required), (dist, probe, int(required))


def test_measure_pair_demand_windowed(interpret_kernel):
    """The probe agrees with the pipeline per screen-tile window (the
    sharded raster path's configuration)."""
    scene = Scene(use_native=False)
    model = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.0, rings=10, sectors=14))
    scene.add_instance(ModelInstance(model))
    fw = fh = 128
    batch = _batch(scene, _cam(2.0))
    for origin in ((0, 0), (0, 64), (0, 0), (0, 64)):
        probe = int(RE.measure_pair_demand(
            batch, fw, fh // 2, full_width=fw, full_height=fh,
            origin=origin))
        _, _, _, required = RE.rasterize_exact(
            batch, fw, fh // 2, full_width=fw, full_height=fh,
            origin=origin, overflow_cond=False)
        assert probe == int(required), (origin, probe, int(required))
