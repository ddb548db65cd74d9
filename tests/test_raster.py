"""Rasterizer tests: coverage, depth ordering, interpolation, full pipeline."""

import jax.numpy as jnp
import numpy as np

from paperrenderer_tpu.core import (
    Camera,
    Material,
    MaterialRegistry,
    Model,
    ModelInstance,
    Scene,
    make_cube,
    make_plane,
    make_uv_sphere,
)
from paperrenderer_tpu.ops import preprocess as P
from paperrenderer_tpu.ops import raster as R
from paperrenderer_tpu.render import RenderPass


def _single_model_scene(mesh_fn=make_cube, **kw):
    scene = Scene()
    pos, idx, nrm, uv = mesh_fn(**kw)
    model = Model.from_mesh(scene.arena, pos, idx, nrm, uv)
    inst = scene.add_instance(ModelInstance(model))
    return scene, model, inst


def _front_camera(dist=3.0):
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, -dist, 0.0), (0.0, 0.0, 0.0), up=(0, 0, 1))
    return cam


def _render_batch(scene, cam, tri_capacity=256, size=64):
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod,
    )
    batch = R.build_triangle_batch(
        pre, scene.geometry(), cam.matrices, capacity=tri_capacity
    )
    depth, tid, bary = R.rasterize(batch, size, size)
    return pre, batch, depth, tid, bary


def test_cube_covers_center_not_corners():
    scene, model, inst = _single_model_scene()
    cam = _front_camera()
    pre, batch, depth, tid, bary = _render_batch(scene, cam)
    tid = np.asarray(tid)
    assert tid[32, 32] >= 0           # center covered
    assert tid[1, 1] == -1            # corner background
    assert tid[62, 62] == -1
    d = np.asarray(depth)
    assert np.isfinite(d[32, 32])
    assert np.isinf(d[1, 1])


def test_depth_test_picks_nearer_instance():
    scene, model, inst_far = _single_model_scene()
    near = scene.add_instance(ModelInstance(model))
    near.set_transform(pos=(0.0, -1.5, 0.0), scale=0.3)  # small cube in front
    cam = _front_camera()
    pre, batch, depth, tid, bary = _render_batch(scene, cam, tri_capacity=256)
    # center pixel must belong to the near instance: its world_pos y < -0.5
    gbuf = R.resolve_gbuffer(batch, depth, tid, bary)
    wp = np.asarray(gbuf.world_pos)
    assert wp[32, 32, 1] < -1.0  # front face of small cube at y=-1.65


def test_perspective_interpolation_world_positions():
    """Rendered world positions of a ground plane must match ray geometry."""
    scene, model, inst = _single_model_scene(make_plane, size=20.0)
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, 0.0, 3.0), (0.0, 4.0, 0.0), up=(0, 0, 1))
    pre, batch, depth, tid, bary = _render_batch(scene, cam, size=64)
    gbuf = R.resolve_gbuffer(batch, depth, tid, bary)
    wp = np.asarray(gbuf.world_pos)
    cov = np.asarray(gbuf.coverage)
    assert cov.mean() > 0.2
    # all covered points lie on the z=0 plane
    assert np.abs(wp[cov][:, 2]).max() < 1e-3
    # perspective-correct: points lower on screen are closer to the camera
    ys = wp[:, 32, 1]
    rows = np.where(cov[:, 32])[0]
    assert len(rows) > 10
    near_row, far_row = rows.max(), rows.min()
    assert ys[near_row] < ys[far_row]


def test_full_renderpass_pipeline():
    scene = Scene()
    registry = MaterialRegistry()
    pos, idx, nrm, uv = make_uv_sphere(radius=1.0)
    model = Model.from_mesh(scene.arena, pos, idx, nrm, uv)
    inst = ModelInstance(model)
    red = Material("red", albedo=(1.0, 0.1, 0.1), roughness=0.4)
    rp = RenderPass(scene, registry, width=64, height=64)
    rp.add_instance(inst, {0: red.instance()})
    cam = _front_camera(dist=3.0)
    ldr, aux = rp.render(cam)
    img = np.asarray(ldr)
    assert img.shape == (64, 64, 3)
    assert float(aux["coverage"]) > 0.1
    assert int(aux["visible_count"]) == 1
    # center pixel is lit and reddish
    c = img[32, 32]
    assert c[0] > c[1] and c[0] > c[2]
    assert c[0] > 0.05
    # background is black
    assert img[1, 1].max() == 0.0


def test_renderpass_visibility_flag():
    scene = Scene()
    registry = MaterialRegistry()
    pos, idx, nrm, uv = make_cube()
    model = Model.from_mesh(scene.arena, pos, idx, nrm, uv)
    inst = ModelInstance(model)
    rp = RenderPass(scene, registry, width=32, height=32)
    rp.add_instance(inst)
    cam = _front_camera()
    ldr, aux = rp.render(cam)
    assert float(aux["coverage"]) > 0.0
    rp.set_instance_visibility(inst, False)
    ldr2, aux2 = rp.render(cam)
    assert float(aux2["coverage"]) == 0.0


def test_near_plane_clip():
    """Geometry entirely between the eye and the near plane must not
    rasterize (Vulkan clip-volume parity: z < 0 fragments are clipped)."""
    import jax.numpy as jnp

    from paperrenderer_tpu.core import Camera, Model, ModelInstance, Scene
    from paperrenderer_tpu.core.geometry import make_plane
    from paperrenderer_tpu.core import MaterialRegistry
    from paperrenderer_tpu.render import RenderPass

    scene = Scene()
    registry = MaterialRegistry()
    panel = Model.from_mesh(scene.arena, *make_plane(size=4.0), name="panel")
    rp = RenderPass(scene, registry, width=32, height=32)
    inst = ModelInstance(panel)
    rp.add_instance(inst)
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=1.0, far=100.0)
    # camera at z=+2 looking down -z; panel at z=1.5 is INSIDE the near gap
    cam.look_at((0.0, 0.0, 2.0), (0.0, 0.0, 0.0), up=(0, 1, 0))
    inst.set_transform(pos=(0.0, 0.0, 1.5))
    ldr, aux = rp.render(cam)
    assert float(aux["coverage"]) == 0.0
    # move it past the near plane: it must render
    inst.set_transform(pos=(0.0, 0.0, 0.0))
    ldr, aux = rp.render(cam)
    assert float(aux["coverage"]) > 0.5


def test_supersample_resolves_to_native_resolution():
    """supersample=2 (the reference's MSAA sampleCount analogue,
    RenderPass.h:61) renders 2x2 ordered samples per pixel and box-resolves:
    output shape stays native, the image stays close to the 1-sample render,
    and coverage-edge pixels actually change (antialiasing happened)."""
    from paperrenderer_tpu.core import (
        Material, MaterialRegistry, Model, ModelInstance, Scene, make_cube,
    )
    from paperrenderer_tpu.render import RenderPass

    def build(ss):
        scene = Scene()
        registry = MaterialRegistry()
        cube = Model.from_mesh(scene.arena, *make_cube(size=1.4), name="cube")
        rp = RenderPass(scene, registry, width=64, height=64,
                        supersample=ss)
        inst = ModelInstance(cube)
        inst.set_transform(quat=(0.92, 0.2, 0.3, 0.1))
        rp.add_instance(inst, {0: Material(
            f"m{ss}", albedo=(0.8, 0.2, 0.2)).instance()})
        cam = _front_camera()
        return np.asarray(rp.render(cam)[0])

    img1 = build(1)
    img2 = build(2)
    assert img2.shape == img1.shape == (64, 64, 3)
    # same scene, so the images agree closely in the mean...
    assert abs(img2.mean() - img1.mean()) < 0.01
    # ...but the resolve produced intermediate edge values absent at ss=1
    diff = np.abs(img2 - img1).max(axis=-1)
    assert (diff > 0.05).any()


def test_supersample_draw_list_path():
    """supersample applies on the reference-parity draw-list path too
    (static_path=False) — the constructor option must not silently no-op."""
    from paperrenderer_tpu.core import (
        Material, MaterialRegistry, Model, ModelInstance, Scene, make_cube,
    )
    from paperrenderer_tpu.render import RenderPass

    def build(ss):
        scene = Scene()
        registry = MaterialRegistry()
        cube = Model.from_mesh(scene.arena, *make_cube(size=1.4), name="cube")
        rp = RenderPass(scene, registry, width=64, height=64, supersample=ss)
        inst = ModelInstance(cube)
        inst.set_transform(quat=(0.92, 0.2, 0.3, 0.1))
        rp.add_instance(inst, {0: Material(
            f"d{ss}", albedo=(0.8, 0.2, 0.2)).instance()})
        cam = _front_camera()
        ldr, aux = rp.render(cam, static_path=False)
        return np.asarray(ldr), np.asarray(aux["depth"])

    img1, d1 = build(1)
    img2, d2 = build(2)
    assert img2.shape == img1.shape == (64, 64, 3)
    assert d2.shape == d1.shape == (64, 64)
    assert abs(img2.mean() - img1.mean()) < 0.01
    diff = np.abs(img2 - img1).max(axis=-1)
    assert (diff > 0.05).any()


def test_lights_replace_refreshes_static_flags():
    """Lights.replace keeps the static shadow/hard mirrors in sync with the
    arrays (dataclasses.replace would silently leave them stale and a
    dynamically-enabled light would never trace its shadow wavefront)."""
    from paperrenderer_tpu.ops.shading import Lights

    lights = Lights.make([
        {"position": (0, 0, 5), "cast_shadow": False, "radius": 0.0},
    ])
    assert lights.shadow_flags == (False,)
    assert lights.hard_flags == (True,)
    on = lights.replace(cast_shadow=np.array([True]),
                        radius=np.array([0.5], np.float32))
    assert on.shadow_flags == (True,)
    assert on.hard_flags == (False,)
    assert bool(np.asarray(on.cast_shadow)[0])
    # replacing unrelated fields keeps the mirrors untouched
    moved = on.replace(position=np.zeros((1, 3), np.float32))
    assert moved.shadow_flags == (True,) and moved.hard_flags == (False,)
