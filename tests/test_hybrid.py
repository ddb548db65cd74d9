"""Hybrid frame + engine facade + animation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from paperrenderer_tpu.core import (
    Camera,
    Material,
    Model,
    ModelInstance,
    RenderEngine,
    make_cube,
    make_plane,
)
from paperrenderer_tpu.ops.animation import animate_instances, animate_vertices
from paperrenderer_tpu.ops.shading import Lights


def _engine_scene():
    eng = RenderEngine(device_check=False)
    ground = Model.from_mesh(eng.scene.arena, *make_plane(size=20.0), name="ground")
    cube = Model.from_mesh(eng.scene.arena, *make_cube(size=1.0), name="cube")
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, -5.0, 3.0), (0.0, 0.0, 0.5), up=(0, 0, 1))
    return eng, ground, cube, cam


def test_hybrid_shadow_darkens_occluded_plane():
    eng, ground, cube, cam = _engine_scene()
    hy = eng.create_hybrid_render(
        width=48, height=48,
        lights=Lights.make(
            [{"position": (0.0, 0.0, 8.0), "color": (300, 300, 300),
              "bounds": 60.0, "radius": 0.0}],
            ambient=(1, 1, 1, 0.25),
        ),
        shadow_samples=1, reflection_samples=0, ao_samples=0,
    )
    white = Material("white", albedo=(0.8, 0.8, 0.8), roughness=0.9)
    g = ModelInstance(ground)
    hy.add_instance(g, {0: white.instance()})
    c = ModelInstance(cube)
    c.set_transform(pos=(0.0, 0.0, 1.2))
    hy.add_instance(c, {0: white.instance()})
    ldr, aux = hy.render(cam)
    img = np.asarray(ldr)
    assert np.isfinite(img).all()
    assert float(aux["coverage"]) > 0.3
    # find the plane pixel straight below the cube (shadowed) vs an offset
    # plane pixel (lit). With light straight above the cube at z=1.2, the
    # plane under it is occluded.
    # project world (0,0,0) and (3,0,0) to pixels:
    def to_px(p):
        vp = np.asarray(cam.matrices.view_proj)
        h = vp @ np.array([*p, 1.0])
        ndc = h[:3] / h[3]
        x = int((ndc[0] * 0.5 + 0.5) * 48)
        y = int((0.5 - ndc[1] * 0.5) * 48)
        return y, x

    y0, x0 = to_px((0.0, 0.0, 0.0))
    y1, x1 = to_px((3.0, 0.0, 0.0))
    shadowed = img[y0, x0].mean()
    lit = img[y1, x1].mean()
    assert shadowed < lit * 0.7, (shadowed, lit)


def test_engine_lifecycle_and_stats():
    eng, ground, cube, cam = _engine_scene()
    rp = eng.create_render_pass(width=32, height=32)
    rp.add_instance(ModelInstance(cube))
    arrays = eng.begin_frame()
    assert arrays.capacity >= 1
    ldr, aux = rp.render(cam)
    eng.end_frame()
    assert eng.frame_number == 1
    stats, counters = eng.statistics.snapshot()
    names = [s[0] for s in stats]
    assert "Begin Frame" in names and "Frame" in names


def test_animate_vertices_displaces_z_only():
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)), jnp.float32)
    out = animate_vertices(pos, jnp.float32(1.0), amplitude=0.2)
    np.testing.assert_array_equal(np.asarray(out[:, :2]), np.asarray(pos[:, :2]))
    dz = np.asarray(out[:, 2] - pos[:, 2])
    assert np.abs(dz).max() <= 0.2 + 1e-6
    assert np.abs(dz).max() > 0.01


def test_animate_instances_device_side():
    eng, ground, cube, cam = _engine_scene()
    insts = []
    for k in range(4):
        i = ModelInstance(cube)
        eng.scene.add_instance(i)
        i.set_transform(pos=(k, 0.0, 0.0))
        insts.append(i)
    arrays = eng.scene.flush()
    out = animate_instances(arrays, jnp.float32(0.7))
    # positions bob in z, xy unchanged; dead rows untouched
    np.testing.assert_allclose(np.asarray(out.pos[:4, :2]), np.asarray(arrays.pos[:4, :2]))
    assert (np.abs(np.asarray(out.pos[:4, 2] - arrays.pos[:4, 2])) > 1e-4).any()
    np.testing.assert_array_equal(np.asarray(out.model_id), np.asarray(arrays.model_id))
    # quats stay normalized
    norms = np.linalg.norm(np.asarray(out.quat[:4]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
