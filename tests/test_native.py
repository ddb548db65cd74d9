"""Native scenecore tests: arena allocator semantics (FragmentableBuffer
parity), delta packer, morton codes, and Scene native-vs-python equivalence."""

import numpy as np
import pytest

from paperrenderer_tpu import native

pytestmark = pytest.mark.skipif(
    not native.AVAILABLE, reason="libscenecore.so not built (make -C native)"
)


def test_arena_stack_and_alignment():
    a = native.NativeArena(1024, alignment=16)
    o1 = a.alloc(10)
    o2 = a.alloc(20)
    assert o1 == 0 and o2 == 16
    assert a.stack_top == 48  # 16 + 32


def test_arena_best_fit_reuse():
    a = native.NativeArena(4096, alignment=1)
    o1 = a.alloc(100)
    o2 = a.alloc(300)
    o3 = a.alloc(100)
    a.free(o2)
    # a 200-byte request best-fits into the 300 hole, leaving a 100 tail
    o4 = a.alloc(200)
    assert o4 == o2
    o5 = a.alloc(100)  # the tail
    assert o5 == o2 + 200
    assert a.stack_top == 500  # no new stack growth


def test_arena_top_free_shrinks():
    a = native.NativeArena(1024, alignment=1)
    o1 = a.alloc(100)
    o2 = a.alloc(100)
    a.free(o2)
    assert a.stack_top == 100
    assert a.alloc(50) == 100  # stack reuse


def test_arena_oom_returns_none():
    a = native.NativeArena(128, alignment=1)
    assert a.alloc(100) is not None
    assert a.alloc(100) is None  # over capacity


def test_arena_compaction_relocations():
    a = native.NativeArena(4096, alignment=1)
    offs = [a.alloc(100) for _ in range(5)]
    a.free(offs[1])
    a.free(offs[3])
    old, new, sizes, top = a.compact()
    assert top == 300
    # blocks 2 and 4 moved down
    assert list(old) == [offs[2], offs[4]]
    assert list(new) == [100, 200]
    assert list(sizes) == [100, 100]
    # arena is dense now: next alloc goes at 300
    assert a.alloc(10) == 300


def test_packer_set_pack_roundtrip():
    p = native.NativeDeltaPacker(8)
    p.set(2, pos=(1, 2, 3), scale=(2, 2, 2), quat=(0, 1, 0, 0), model_id=7)
    p.set(5, pos=(4, 5, 6), model_id=1)
    p.set(2, pos=(9, 9, 9))  # re-dirty same row: no duplicate
    assert p.dirty_count == 2
    n, idx, pos, scale, quat, model = p.pack(8)
    assert n == 2
    assert sorted(idx[:n].tolist()) == [2, 5]
    row2 = list(idx[:n]).index(2)
    np.testing.assert_allclose(pos[row2], [9, 9, 9])
    np.testing.assert_allclose(scale[row2], [2, 2, 2])
    assert model[row2] == 7
    assert p.dirty_count == 0


def test_packer_views_zero_copy():
    p = native.NativeDeltaPacker(4)
    p.set(1, pos=(5, 5, 5), model_id=3)
    pos, scale, quat, model = p.views()
    np.testing.assert_allclose(pos[1], [5, 5, 5])
    assert model[1] == 3
    assert model[0] == -1
    np.testing.assert_allclose(quat[0], [1, 0, 0, 0])  # identity default


def test_packer_swap_remove():
    p = native.NativeDeltaPacker(4)
    p.set(0, pos=(0, 0, 0), model_id=0)
    p.set(1, pos=(1, 1, 1), model_id=1)
    p.set(2, pos=(2, 2, 2), model_id=2)
    p.pack(8)  # clear dirties
    p.swap_remove(0, 2)  # slot 2 moves into 0
    pos, scale, quat, model = p.views()
    np.testing.assert_allclose(pos[0], [2, 2, 2])
    assert model[0] == 2
    assert model[2] == -1
    assert p.dirty_count == 2


def test_native_morton_orders_spatially():
    pts = np.asarray([[0, 0, 0], [0.1, 0, 0], [1, 1, 1]], np.float32)
    codes = native.morton3d(pts, [0, 0, 0], [1, 1, 1])
    assert codes[0] < codes[1] < codes[2]


def test_scene_native_matches_python():
    """The same scene operations give identical device arrays with and
    without the native backend."""
    from paperrenderer_tpu.core import Model, ModelInstance, Scene, make_cube

    def run(use_native):
        scene = Scene(use_native=use_native)
        model = Model.from_mesh(scene.arena, *make_cube())
        insts = [scene.add_instance(ModelInstance(model)) for _ in range(5)]
        for k, inst in enumerate(insts):
            inst.set_transform(pos=(k, 2 * k, 0), scale=1 + 0.1 * k)
        arrays = scene.flush()
        insts[1].set_transform(pos=(100, 0, 0))
        scene.remove_instance(insts[3])
        arrays = scene.flush()
        return arrays

    a = run(True)
    b = run(False)
    np.testing.assert_array_equal(np.asarray(a.model_id), np.asarray(b.model_id))
    live = np.asarray(a.model_id) >= 0  # dead-row contents are don't-care
    np.testing.assert_allclose(np.asarray(a.pos)[live], np.asarray(b.pos)[live])
    np.testing.assert_allclose(np.asarray(a.scale)[live], np.asarray(b.scale)[live])
    np.testing.assert_allclose(np.asarray(a.quat)[live], np.asarray(b.quat)[live])
