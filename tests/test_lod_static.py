"""LOD behavior through the static fast path: far instances must render the
coarse LOD's triangles, near instances the fine LOD's."""

import jax.numpy as jnp
import numpy as np

from paperrenderer_tpu.core import (
    Camera, MaterialMesh, Model, ModelInstance, Scene,
    make_cube, make_uv_sphere,
)
from paperrenderer_tpu.ops.static_batch import build_static_mapping, expand_static


def test_static_expansion_masks_by_lod():
    scene = Scene()
    fine = scene.arena.add_mesh(*make_uv_sphere(radius=0.5, rings=12, sectors=16))
    coarse = scene.arena.add_mesh(*make_cube(size=1.0))
    model = Model(scene.arena, [[MaterialMesh(fine, 0)], [MaterialMesh(coarse, 0)]])
    near = scene.add_instance(ModelInstance(model))
    near.set_transform(pos=(-2.0, 0, 0))
    far = scene.add_instance(ModelInstance(model))
    far.set_transform(pos=(400.0, 0, 0))
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=1000.0)
    cam.look_at((-10.0, 0, 0), (1.0, 0, 0), up=(0, 0, 1))
    arrays = scene.flush()
    mapping = build_static_mapping(scene)
    slots = jnp.zeros((arrays.capacity, 1), jnp.int32)
    batch, vis = expand_static(
        mapping, arrays, scene.tables(), cam.matrices, slots, do_culling=False
    )
    valid = np.asarray(batch.valid)
    inst = np.asarray(mapping.tri_instance)
    lod = np.asarray(mapping.tri_lod)
    # near instance: only its LOD-0 (sphere) triangles valid
    near_valid_lods = set(lod[(inst == near.index) & valid].tolist())
    far_valid_lods = set(lod[(inst == far.index) & valid].tolist())
    assert near_valid_lods == {0}
    assert far_valid_lods == {1}
    # triangle counts match the chosen meshes
    assert ((inst == near.index) & valid).sum() == fine.tri_count
    assert ((inst == far.index) & valid).sum() == coarse.tri_count
    # lod_override=0 (the RT path) forces the fine LOD everywhere
    b2, _ = expand_static(
        mapping, arrays, scene.tables(), cam.matrices, slots,
        do_culling=False, lod_override=0,
    )
    v2 = np.asarray(b2.valid)
    assert set(np.asarray(mapping.tri_lod)[(inst == far.index) & v2].tolist()) == {0}


def test_vertex_animation_hook():
    """expand_static's animate hook displaces object-space vertices
    (BasicAnimation.comp parity: parent VBO -> displaced unique VBO)."""
    from paperrenderer_tpu.ops.animation import animate_vertices

    scene = Scene()
    model = Model.from_mesh(scene.arena, *make_cube())
    scene.add_instance(ModelInstance(model))
    cam = Camera()
    cam.look_at((0, -4, 0), (0, 0, 0))
    arrays = scene.flush()
    mapping = build_static_mapping(scene)
    slots = jnp.zeros((arrays.capacity, 1), jnp.int32)
    still, _ = expand_static(
        mapping, arrays, scene.tables(), cam.matrices, slots, do_culling=False
    )
    moved, _ = expand_static(
        mapping, arrays, scene.tables(), cam.matrices, slots, do_culling=False,
        animate=lambda v, t: animate_vertices(v, t, amplitude=0.3),
        animate_time=jnp.float32(1.0),
    )
    dz = np.asarray(moved.world[..., 2] - still.world[..., 2])
    v = np.asarray(still.valid)
    assert np.abs(dz[v]).max() > 0.01          # something moved in z
    dxy = np.asarray(moved.world[..., :2] - still.world[..., :2])
    assert np.abs(dxy[v]).max() < 1e-6         # xy untouched
