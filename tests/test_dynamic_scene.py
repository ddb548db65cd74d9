"""Raindrop-style dynamic scenes: per-frame instance add/remove through both
render paths (the reference example's raindrop spawner, main.cpp:780-833)."""

import numpy as np

from paperrenderer_tpu.core import (
    Camera, Material, MaterialRegistry, Model, ModelInstance, Scene, make_cube,
)
from paperrenderer_tpu.render import RenderPass


def test_per_frame_add_remove_renders():
    scene = Scene()
    registry = MaterialRegistry()
    cube = Model.from_mesh(scene.arena, *make_cube(size=0.5))
    rp = RenderPass(scene, registry, width=32, height=32)
    blue = Material("drop", albedo=(0.2, 0.4, 0.9))
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, -6.0, 2.0), (0.0, 0.0, 0.0), up=(0, 0, 1))

    drops = []
    coverages = []
    rng = np.random.default_rng(0)
    for frame in range(6):
        # spawn one drop per frame, despawn when it falls below the floor
        inst = ModelInstance(cube)
        rp.add_instance(inst, {0: blue.instance()})
        inst.set_transform(pos=(rng.uniform(-2, 2), rng.uniform(-1, 1), 3.0))
        drops.append(inst)
        for d in drops:
            d.set_transform(pos=d.position - np.asarray([0, 0, 0.8], np.float32))
        for d in [d for d in drops if d.position[2] < -1.0]:
            rp.remove_instance(d)
            scene.remove_instance(d)
            drops.remove(d)
        # draw-list path: no static-mapping rebuild per topology change
        ldr, aux = rp.render(cam, static_path=False)
        coverages.append(float(aux["coverage"]))
        assert np.isfinite(np.asarray(ldr)).all()
    assert max(coverages) > 0.0
    # static path also works right after topology churn (rebuilds mapping)
    ldr, aux = rp.render(cam, static_path=True)
    assert np.isfinite(np.asarray(ldr)).all()


def test_resize_recompiles_cleanly():
    scene = Scene()
    registry = MaterialRegistry()
    cube = Model.from_mesh(scene.arena, *make_cube())
    rp = RenderPass(scene, registry, width=32, height=32)
    rp.add_instance(ModelInstance(cube))
    cam = Camera(yfov_deg=60.0, aspect=1.0)
    cam.look_at((0.0, -4.0, 1.0), (0, 0, 0), up=(0, 0, 1))
    ldr1, _ = rp.render(cam)
    assert np.asarray(ldr1).shape == (32, 32, 3)
    rp.resize(64, 64)
    ldr2, _ = rp.render(cam)
    assert np.asarray(ldr2).shape == (64, 64, 3)
