"""Multi-material-slot models through the full raster pipeline: one model
whose two meshes bind different material slots (reference: per-primitive
material slots from glTF, per-RenderPass MaterialInstance bindings)."""

import numpy as np

from paperrenderer_tpu.core import (
    Camera, Material, MaterialMesh, MaterialRegistry, Model, ModelInstance,
    Scene, make_plane,
)
from paperrenderer_tpu.render import RenderPass


def test_two_slot_model_renders_both_materials():
    scene = Scene()
    registry = MaterialRegistry()
    # two quads side by side, different slots, one Model
    import numpy as _np

    p, i, n, u = make_plane(size=1.5)
    left = scene.arena.add_mesh(p - _np.asarray([1.0, 0, 0], _np.float32), i, n, u)
    right = scene.arena.add_mesh(p + _np.asarray([1.0, 0, 0], _np.float32), i, n, u)
    model = Model(
        scene.arena,
        [[MaterialMesh(left, 0), MaterialMesh(right, 1)]],
        name="two-slot",
    )
    rp = RenderPass(scene, registry, width=48, height=48)
    red = Material("red", emissive=(1, 0, 0))
    green = Material("green", emissive=(0, 1, 0))
    inst = ModelInstance(model)
    rp.add_instance(inst, {0: red.instance(), 1: green.instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0), up=(0, 1, 0))
    ldr, aux = rp.render(cam)
    img = np.asarray(ldr)
    l = img[24, 14]
    r = img[24, 34]
    assert l[0] > l[1], f"left should be red: {l}"
    assert r[1] > r[0], f"right should be green: {r}"


def test_per_instance_slot_overrides():
    """Two instances of the same model with different slot bindings."""
    scene = Scene()
    registry = MaterialRegistry()
    p, i, n, u = make_plane(size=1.5)
    h = scene.arena.add_mesh(p, i, n, u)
    model = Model(scene.arena, [[MaterialMesh(h, 0)]])
    rp = RenderPass(scene, registry, width=48, height=48)
    red = Material("red", emissive=(1, 0, 0))
    blue = Material("blue", emissive=(0, 0, 1))
    a = ModelInstance(model)
    a.set_transform(pos=(-1.2, 0, 0))
    rp.add_instance(a, {0: red.instance()})
    b = ModelInstance(model)
    b.set_transform(pos=(1.2, 0, 0))
    rp.add_instance(b, {0: blue.instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0), up=(0, 1, 0))
    ldr, _ = rp.render(cam)
    img = np.asarray(ldr)
    l = img[24, 13]
    r = img[24, 35]
    assert l[0] > l[2], f"left should be red: {l}"
    assert r[2] > r[0], f"right should be blue: {r}"
