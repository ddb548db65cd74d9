"""Scene/geometry bookkeeping tests: arena packing, compaction, swap-remove
instance registry semantics (mirroring the reference's addObject/removeObject
property: indices stay dense, last element fills holes)."""

import numpy as np

from paperrenderer_tpu.core import (
    GeometryArena,
    MaterialMesh,
    Model,
    ModelInstance,
    Scene,
    make_cube,
    make_uv_sphere,
)


def _cube_model(scene, name="cube"):
    pos, idx, nrm, uv = make_cube()
    return Model.from_mesh(scene.arena, pos, idx, nrm, uv, name=name)


def test_arena_packing_and_global_indices():
    arena = GeometryArena()
    p1, i1, n1, u1 = make_cube()
    p2, i2, n2, u2 = make_uv_sphere()
    h1 = arena.add_mesh(p1, i1, n1, u1)
    h2 = arena.add_mesh(p2, i2, n2, u2)
    assert h2.vertex_offset == h1.vertex_count
    assert h2.tri_offset == h1.tri_count
    dev = arena.device_arrays()
    # triangle indices are arena-global: mesh 2's indices point past mesh 1
    tris2 = np.asarray(dev.indices[h2.tri_offset : h2.tri_offset + h2.tri_count])
    assert tris2.min() >= h1.vertex_count


def test_arena_growth_preserves_data():
    arena = GeometryArena(vertex_capacity=16, tri_capacity=16)
    p, i, n, u = make_cube()
    h1 = arena.add_mesh(p, i, n, u)
    before = np.asarray(arena.device_arrays().positions[: h1.vertex_count]).copy()
    for _ in range(50):  # force several growths
        arena.add_mesh(p, i, n, u)
    after = np.asarray(arena.device_arrays().positions[: h1.vertex_count])
    np.testing.assert_array_equal(before, after)


def test_arena_compaction_relocates():
    arena = GeometryArena()
    p, i, n, u = make_cube()
    h1 = arena.add_mesh(p, i, n, u)
    h2 = arena.add_mesh(p + 10.0, i, n, u)
    h3 = arena.add_mesh(p + 20.0, i, n, u)
    arena.remove_mesh(h2)
    remap = arena.compact()
    assert arena.vertex_count == 2 * h1.vertex_count
    nh3 = remap[h3.mesh_id]
    assert nh3.vertex_offset == h1.vertex_count
    dev = arena.device_arrays()
    pos3 = np.asarray(dev.positions[nh3.vertex_offset : nh3.vertex_offset + nh3.vertex_count])
    np.testing.assert_allclose(pos3, p + 20.0)
    # indices were rebased and still point at mesh-3 vertices
    t = np.asarray(dev.indices[nh3.tri_offset : nh3.tri_offset + nh3.tri_count])
    assert t.min() >= nh3.vertex_offset
    assert t.max() < nh3.vertex_offset + nh3.vertex_count


def test_instance_swap_remove_semantics():
    scene = Scene()
    model = _cube_model(scene)
    insts = [scene.add_instance(ModelInstance(model)) for _ in range(5)]
    assert [i.index for i in insts] == [0, 1, 2, 3, 4]
    scene.remove_instance(insts[1])
    # last instance swapped into slot 1
    assert insts[4].index == 1
    assert scene.instances[1] is insts[4]
    assert scene.count == 4
    assert insts[1].index == -1
    # removing again is a no-op
    scene.remove_instance(insts[1])
    assert scene.count == 4


def test_instance_flush_and_dirty_scatter():
    scene = Scene()
    model = _cube_model(scene)
    insts = [scene.add_instance(ModelInstance(model)) for _ in range(3)]
    insts[0].set_transform(pos=(1, 2, 3))
    arrays = scene.flush()
    np.testing.assert_allclose(np.asarray(arrays.pos[0]), [1, 2, 3])
    assert int(np.asarray(arrays.model_id[2])) == model.model_id
    assert int(np.asarray(arrays.model_id[3])) == -1  # dead slot

    # dirty-row scatter path (no growth)
    insts[2].set_transform(pos=(9, 9, 9), scale=2.0)
    arrays = scene.flush()
    np.testing.assert_allclose(np.asarray(arrays.pos[2]), [9, 9, 9])
    np.testing.assert_allclose(np.asarray(arrays.scale[2]), [2, 2, 2])
    # untouched rows survive the scatter
    np.testing.assert_allclose(np.asarray(arrays.pos[0]), [1, 2, 3])

    # removal marks the tail row dead on next flush
    scene.remove_instance(insts[1])
    arrays = scene.flush()
    alive = np.asarray(arrays.model_id[:4]) >= 0
    assert alive.tolist() == [True, True, False, False]


def test_capacity_growth_keeps_live_rows():
    scene = Scene()
    model = _cube_model(scene)
    for k in range(200):  # beyond the 128 floor -> growth + full rebuild
        inst = scene.add_instance(ModelInstance(model))
        inst.set_transform(pos=(float(k), 0, 0))
    arrays = scene.flush()
    assert arrays.capacity >= 200
    np.testing.assert_allclose(np.asarray(arrays.pos[199]), [199, 0, 0])


def test_scene_tables_layout():
    scene = Scene()
    pos, idx, nrm, uv = make_cube()
    h_hi = scene.arena.add_mesh(pos, idx, nrm, uv)
    p2, i2, n2, u2 = make_uv_sphere(rings=4, sectors=6)
    h_lo = scene.arena.add_mesh(p2, i2, n2, u2)
    model = Model(
        scene.arena,
        [[MaterialMesh(h_hi, 0), MaterialMesh(h_hi, 1)], [MaterialMesh(h_lo, 0)]],
        name="two-lod",
    )
    scene.register_model(model)
    t = scene.tables()
    assert int(t.model_lod_count[0]) == 2
    lod0 = int(t.model_lod_offset[0])
    assert int(t.lod_mesh_count[lod0]) == 2
    assert int(t.lod_mesh_count[lod0 + 1]) == 1
    m0 = int(t.lod_mesh_offset[lod0])
    assert int(t.mesh_slot[m0 + 1]) == 1
    assert int(t.mesh_tri_offset[m0]) == h_hi.tri_offset
    assert scene.max_meshes_per_lod == 2
    assert scene.max_slots == 2


def test_arena_hole_reuse_after_free():
    """Freed mesh ranges are reused best-fit by later adds without compaction
    (FragmentableBuffer::newWrite reuse, VulkanResources.cpp:332-403)."""
    arena = GeometryArena()
    p, i, n, u = make_cube()
    h1 = arena.add_mesh(p, i, n, u)
    h2 = arena.add_mesh(p + 10.0, i, n, u)
    h3 = arena.add_mesh(p + 20.0, i, n, u)
    top_before = arena.vertex_count
    arena.remove_mesh(h2)
    h4 = arena.add_mesh(p + 30.0, i, n, u)   # same size: must reuse the hole
    assert h4.vertex_offset == h2.vertex_offset
    assert h4.tri_offset == h2.tri_offset
    assert arena.vertex_count == top_before  # no growth
    dev = arena.device_arrays()
    pos4 = np.asarray(
        dev.positions[h4.vertex_offset : h4.vertex_offset + h4.vertex_count])
    np.testing.assert_allclose(pos4, p + 30.0)


def test_scene_compact_geometry_keeps_render_identical():
    """Compaction mid-scene relocates live meshes and fixes up every model;
    the rendered image must be unchanged (reference compaction fixup,
    PaperRenderer.cpp:129-149)."""
    from paperrenderer_tpu.core import Camera, MaterialRegistry
    from paperrenderer_tpu.core.geometry import make_uv_sphere as _sph
    from paperrenderer_tpu.render import RenderPass

    scene = Scene()
    registry = MaterialRegistry()
    # doomed mesh first so compaction actually moves the survivors
    doomed = scene.arena.add_mesh(*make_cube(3.0))
    model = _cube_model(scene)
    rp = RenderPass(scene, registry, width=64, height=64)
    inst = ModelInstance(model)
    rp.add_instance(inst, {})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, -3.0, 1.0), (0.0, 0.0, 0.0), up=(0, 0, 1))
    before, _ = rp.render(cam)
    before = np.asarray(before)

    scene.arena.remove_mesh(doomed)
    scene.compact_geometry()
    assert model.lods[0].meshes[0].handle.vertex_offset == 0  # moved down
    after, _ = rp.render(cam)
    np.testing.assert_allclose(np.asarray(after), before, atol=1e-5)


def test_instance_bookkeeping_random_ops_property():
    """Randomized add/remove/transform sequence vs a python mirror: the
    swap-remove registry (PaperRenderer.cpp:255-306 semantics) must keep
    (a) every live instance's index pointing at itself in scene.instances,
    (b) flushed SoA rows matching each live instance's transform + model,
    (c) dead slots marked model_id == -1."""
    rng = np.random.default_rng(1234)
    scene = Scene()
    models = [_cube_model(scene) for _ in range(3)]
    live = []
    removed = []
    for step in range(200):
        op = rng.random()
        if op < 0.5 or not live:
            inst = ModelInstance(models[int(rng.integers(3))])
            scene.add_instance(inst)
            live.append(inst)
        elif op < 0.8:
            k = int(rng.integers(len(live)))
            inst = live.pop(k)
            scene.remove_instance(inst)
            removed.append(inst)
        else:
            k = int(rng.integers(len(live)))
            live[k].set_transform(pos=tuple(rng.normal(size=3)))
        if step % 50 == 49:
            arrays = scene.flush()
            assert scene.count == len(live)
            mid = np.asarray(arrays.model_id)
            pos = np.asarray(arrays.pos)
            for inst in live:
                assert 0 <= inst.index < scene.count
                assert scene.instances[inst.index] is inst
                assert mid[inst.index] == inst.model.model_id
                np.testing.assert_allclose(
                    pos[inst.index], np.asarray(inst.position), atol=1e-6)
            for inst in removed:
                assert inst.index == -1
            assert (mid[scene.count:] == -1).all()
