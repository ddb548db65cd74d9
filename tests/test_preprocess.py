"""Preprocess tests: frustum cull, LOD select, draw-list compaction —
behavioral parity with IndirectDrawBuild.comp / Common.glsl."""

import jax.numpy as jnp
import numpy as np

from paperrenderer_tpu.core import (
    Camera,
    MaterialMesh,
    Model,
    ModelInstance,
    Scene,
    make_cube,
    make_uv_sphere,
)
from paperrenderer_tpu.ops import preprocess as P


def _scene_with_cubes(n, spacing=3.0):
    scene = Scene()
    pos, idx, nrm, uv = make_cube()
    model = Model.from_mesh(scene.arena, pos, idx, nrm, uv, name="cube")
    insts = []
    for i in range(n):
        inst = scene.add_instance(ModelInstance(model))
        inst.set_transform(pos=(i * spacing, 0.0, 0.0))
        insts.append(inst)
    return scene, model, insts


def _camera_looking_down_x():
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=500.0)
    cam.look_at((-10.0, 0.0, 0.0), (1.0, 0.0, 0.0), up=(0, 0, 1))
    return cam


def test_cull_keeps_in_view_drops_behind():
    scene, model, insts = _scene_with_cubes(3, spacing=5.0)
    # instance 2 goes far behind the camera
    insts[2].set_transform(pos=(-100.0, 0.0, 0.0))
    cam = _camera_looking_down_x()
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod,
    )
    vis = np.asarray(pre.visible[:3])
    assert vis[0] and vis[1]
    assert not vis[2]


def test_cull_drops_far_off_axis():
    scene, model, insts = _scene_with_cubes(2)
    insts[1].set_transform(pos=(5.0, 1000.0, 0.0))  # far off to the side
    cam = _camera_looking_down_x()
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod,
    )
    vis = np.asarray(pre.visible[:2])
    assert vis[0] and not vis[1]


def test_no_culling_keeps_alive_only():
    scene, model, insts = _scene_with_cubes(2)
    insts[1].set_transform(pos=(-100.0, 0.0, 0.0))
    cam = _camera_looking_down_x()
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod, do_culling=False,
    )
    vis = np.asarray(pre.visible)
    assert vis[0] and vis[1]
    assert not vis[2:].any()  # dead slots never visible


def test_lod_selection_formula():
    """LOD = floor(invsqrt(size*10)*sqrt(dist)), clamped to lod_count-1."""
    scene = Scene()
    p, i, n, u = make_cube()
    h0 = scene.arena.add_mesh(p, i, n, u)
    p2, i2, n2, u2 = make_uv_sphere(rings=3, sectors=4)
    h1 = scene.arena.add_mesh(p2, i2, n2, u2)
    model = Model(scene.arena, [[MaterialMesh(h0, 0)], [MaterialMesh(h1, 0)]])
    near = scene.add_instance(ModelInstance(model))
    near.set_transform(pos=(-2.0, 0, 0))  # dist 8 from camera -> LOD 0
    far = scene.add_instance(ModelInstance(model))
    far.set_transform(pos=(400.0, 0, 0))
    cam = _camera_looking_down_x()
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod, do_culling=False,
    )
    lod = np.asarray(pre.lod[:2])
    # independent recompute of the reference formula
    cam_pos = np.asarray(cam.matrices.cam_pos)
    size = 1.0  # unit cube
    for k, inst in enumerate([near, far]):
        dist = np.linalg.norm(inst.position - cam_pos)
        want = min(int(np.floor((size * 10.0) ** -0.5 * np.sqrt(dist))), 1)
        assert lod[k] == want
    assert lod[0] == 0 and lod[1] == 1  # sanity: far instance uses coarse LOD


def test_draw_list_compaction_deterministic():
    scene, model, insts = _scene_with_cubes(4)
    insts[1].set_transform(pos=(-100.0, 0, 0))  # culled
    cam = _camera_looking_down_x()
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod,
    )
    count = int(pre.draw_count)
    assert count == 3
    rows = np.asarray(pre.draw_instance[:count])
    assert sorted(rows.tolist()) == [0, 2, 3]
    # rows past draw_count are dead
    assert (np.asarray(pre.draw_instance[count:]) == -1).all()
    assert (np.asarray(pre.draw_tri_count[count:]) == 0).all()
    assert int(pre.total_tris) == 3 * 12  # cube = 12 tris


def test_mesh_group_instance_counts():
    scene, model, insts = _scene_with_cubes(5)
    cam = _camera_looking_down_x()
    pre = P.preprocess_instances(
        scene.flush(), scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod, do_culling=False,
    )
    counts = np.asarray(P.mesh_group_instance_counts(pre, 1))
    assert counts[0] == 5


def test_slot_material_resolution():
    scene, model, insts = _scene_with_cubes(2)
    cam = _camera_looking_down_x()
    arrays = scene.flush()
    slot_mats = jnp.zeros((arrays.capacity, 1), jnp.int32).at[1, 0].set(7)
    pre = P.preprocess_instances(
        arrays, scene.tables(), cam.matrices,
        max_meshes_per_lod=scene.max_meshes_per_lod,
        do_culling=False, slot_materials=slot_mats,
    )
    count = int(pre.draw_count)
    inst = np.asarray(pre.draw_instance[:count])
    mats = np.asarray(pre.draw_material[:count])
    assert mats[inst == 0].tolist() == [0]
    assert mats[inst == 1].tolist() == [7]
