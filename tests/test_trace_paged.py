"""Paged (chunked-TLAS) packet traversal tests — interpret mode on CPU.

The paged kernels (ops/trace_paged.py) stream TLAS chunk blocks HBM->SMEM
in-kernel; correctness reference is the XLA lockstep traversal over the
flattened view (accel.paged_to_flat), which these tests also sanity-check
against the regular flat assembly path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.ops import accel as A
from paperrenderer_tpu.ops import trace_paged as TP
from paperrenderer_tpu.ops.trace import raygen


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(TP, "INTERPRET", True)


def _many_instance_scene(n_inst, seed=0):
    from paperrenderer_tpu.core import (
        Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
        make_cube, make_uv_sphere,
    )
    from paperrenderer_tpu.render import RenderPass

    rng = np.random.default_rng(seed)
    scene = Scene()
    registry = MaterialRegistry()
    sphere = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=0.5, rings=5, sectors=6))
    cube = Model.from_mesh(scene.arena, *make_cube(size=0.7))
    rp = RenderPass(scene, registry, width=32, height=32)
    red = Material("red", albedo=(0.8, 0.2, 0.2), roughness=0.5)
    blue = Material("blue", albedo=(0.2, 0.2, 0.8), roughness=0.5)
    side = max(4.0, float(n_inst) ** (1 / 3) * 1.3)
    for i in range(n_inst):
        m = ModelInstance(sphere if i % 2 == 0 else cube)
        m.set_transform(pos=tuple(rng.uniform(-side, side, 3)))
        rp.add_instance(m, {0: (red if i % 2 else blue).instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=1000.0)
    cam.look_at((0.0, -2.6 * side, 1.2 * side), (0, 0, 0), up=(0, 0, 1))
    return scene, registry, rp, cam


@pytest.fixture(scope="module")
def paged_scene():
    """600 instances -> 4 TLAS chunks (multi-chunk paging exercised)."""
    scene, registry, rp, cam = _many_instance_scene(600)
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    inst_blas = jnp.asarray(inst_blas)
    tri_attr = A.build_tri_attr(scene)
    slots = rp._slot_material_array(instances.capacity)
    mask = jnp.ones(instances.capacity, bool)
    paged, proot = A.assemble_scene_paged(
        blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
        mask, slots, tri_attr)
    flat, remap_root = A.paged_to_flat(paged)
    ss = A.required_stack_size(meta, instances.capacity)
    o, d = raygen(cam.matrices, 32, 32)
    t_max = jnp.full(o.shape[0], 1e4)
    return (rp, paged, proot, flat, remap_root(proot), ss, instances,
            slots, o, d, t_max)


def test_paged_assembly_has_chunks(paged_scene):
    _, paged, *_ = paged_scene
    nc = paged.chunk_boxes.shape[0] // (A.BROWS * 12)
    assert nc >= 2, "fixture must exercise multi-chunk paging"


@pytest.mark.parametrize("wide", [False, True])
def test_paged_matches_flat_xla(paged_scene, wide):
    (rp, paged, proot, flat, froot, ss, instances, slots,
     o, d, t_max) = paged_scene
    bound = 2 * instances.capacity * (flat.leaf_rows.shape[0] + 2) + 4096
    rec_p = TP.trace_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss, max_steps=bound,
        wide=wide)
    rec_x = A.trace_scene(flat, o, d, t_max, root_code=froot, stack_size=ss)
    hp = np.asarray(rec_p.hit)
    hx = np.asarray(rec_x.hit)
    np.testing.assert_array_equal(hp, hx)
    assert hp.any()
    both = hp & hx
    np.testing.assert_allclose(
        np.asarray(rec_p.t)[both], np.asarray(rec_x.t)[both],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(rec_p.prim)[both], np.asarray(rec_x.prim)[both])
    np.testing.assert_array_equal(
        np.asarray(rec_p.inst)[both], np.asarray(rec_x.inst)[both])


@pytest.mark.parametrize("wide", [False, True])
def test_paged_fused_resolve(paged_scene, wide):
    (rp, paged, proot, flat, froot, ss, instances, slots,
     o, d, t_max) = paged_scene
    bound = 2 * instances.capacity * (flat.leaf_rows.shape[0] + 2) + 4096
    table = rp.materials.table()
    out = TP.trace_resolve_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss, max_steps=bound,
        n_slots=slots.shape[1], wide=wide)
    tracer = A.SceneTracer(flat, slots, table, root_code=froot,
                           stack_size=ss, use_pallas=False)
    rec = tracer.trace(o, d, t_max)
    surf = tracer.resolve(rec, o, d)
    hk = np.asarray(out["prim"]) >= 0
    np.testing.assert_array_equal(hk, np.asarray(surf.valid))
    h = hk
    np.testing.assert_array_equal(
        np.asarray(out["material"])[h], np.asarray(surf.material)[h])
    np.testing.assert_allclose(
        np.asarray(out["uv"])[h], np.asarray(surf.uv)[h],
        rtol=1e-3, atol=1e-4)
    n = np.asarray(out["normal"])[h]
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    dd = np.asarray(d)[h]
    facing = (n * dd).sum(-1) < 0.0
    n = np.where(facing[:, None], n, -n)
    np.testing.assert_allclose(
        n, np.asarray(surf.normal)[h], rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("wide", [False, True])
def test_paged_any_hit(paged_scene, wide):
    (rp, paged, proot, flat, froot, ss, instances, slots,
     o, d, t_max) = paged_scene
    bound = 2 * instances.capacity * (flat.leaf_rows.shape[0] + 2) + 4096
    rec_a = TP.trace_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss, max_steps=bound,
        any_hit=True, wide=wide)
    rec_x = A.trace_scene(flat, o, d, t_max, root_code=froot, stack_size=ss)
    np.testing.assert_array_equal(
        np.asarray(rec_a.hit), np.asarray(rec_x.hit))


def test_flat_view_matches_regular_assembly(paged_scene):
    """paged_to_flat must traverse identically to the regular flat
    assemble_scene of the same frame."""
    (rp, paged, proot, flat, froot, ss, instances, slots,
     o, d, t_max) = paged_scene
    scene = rp.scene
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), [jnp.ones(instances.capacity, bool)],
        A.build_tri_attr(scene))
    rec_flatview = A.trace_scene(
        flat, o, d, t_max, root_code=froot, stack_size=ss)
    rec_reg = A.trace_scene(
        rts, o, d, t_max, root_code=roots[0], stack_size=ss)
    np.testing.assert_array_equal(
        np.asarray(rec_flatview.hit), np.asarray(rec_reg.hit))
    both = np.asarray(rec_flatview.hit)
    np.testing.assert_allclose(
        np.asarray(rec_flatview.t)[both], np.asarray(rec_reg.t)[both],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(rec_flatview.prim)[both], np.asarray(rec_reg.prim)[both])


# ---------------------------------------------------------------------------
# BLAS paging (round 5): big models stream their BLAS subtrees HBM->SMEM
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def big_blas_scene():
    """One >256-leaf-row model (forces BLAS chunking) + small models.

    The reference sizes BLAS buffers in HBM so any model traces at full
    speed (AccelerationStructure.cpp:139-216); this pins the paged path's
    equivalent: big BLASes split into streamed subtree chunks
    (accel._chunk_blas_host) with the flattened view as the reference."""
    from paperrenderer_tpu.core import (
        Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
        make_cube, make_uv_sphere,
    )
    from paperrenderer_tpu.render import RenderPass

    rng = np.random.default_rng(7)
    scene = Scene()
    registry = MaterialRegistry()
    # 40x52 sphere = 4160 tris -> 520 leaf rows -> >= 2 BLAS chunks
    big = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=1.2, rings=40, sectors=52))
    cube = Model.from_mesh(scene.arena, *make_cube(size=0.7))
    rp = RenderPass(scene, registry, width=32, height=32)
    red = Material("red", albedo=(0.8, 0.2, 0.2), roughness=0.5)
    blue = Material("blue", albedo=(0.2, 0.2, 0.8), roughness=0.5)
    for i in range(24):
        m = ModelInstance(big if i % 3 == 0 else cube)
        m.set_transform(pos=tuple(rng.uniform(-6.0, 6.0, 3)))
        rp.add_instance(m, {0: (red if i % 2 else blue).instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=1000.0)
    cam.look_at((0.0, -16.0, 7.0), (0, 0, 0), up=(0, 0, 1))

    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    assert meta.num_bchunks >= 2, meta.num_bchunks
    assert A.prefer_paged(meta, 32)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    inst_blas = jnp.asarray(inst_blas)
    tri_attr = A.build_tri_attr(scene)
    slots = rp._slot_material_array(instances.capacity)
    mask = jnp.ones(instances.capacity, bool)
    paged, proot = A.assemble_scene_paged(
        blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
        mask, slots, tri_attr)
    flat, remap_root = A.paged_to_flat(paged)
    ss = A.required_stack_size(meta, instances.capacity)
    o, d = raygen(cam.matrices, 32, 32)
    t_max = jnp.full(o.shape[0], 1e4)
    return (rp, paged, proot, flat, remap_root(proot), ss, instances,
            slots, o, d, t_max)


@pytest.mark.parametrize("wide", [False, True])
def test_big_blas_paged_matches_flat(big_blas_scene, wide):
    (rp, paged, proot, flat, froot, ss, instances, slots,
     o, d, t_max) = big_blas_scene
    bound = 2 * instances.capacity * (flat.leaf_rows.shape[0] + 2) + 4096
    rec_p = TP.trace_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss, max_steps=bound,
        wide=wide)
    rec_x = A.trace_scene(flat, o, d, t_max, root_code=froot, stack_size=ss)
    hp, hx = np.asarray(rec_p.hit), np.asarray(rec_x.hit)
    np.testing.assert_array_equal(hp, hx)
    assert hp.any()
    both = hp & hx
    np.testing.assert_allclose(
        np.asarray(rec_p.t)[both], np.asarray(rec_x.t)[both],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(rec_p.prim)[both], np.asarray(rec_x.prim)[both])
    np.testing.assert_array_equal(
        np.asarray(rec_p.inst)[both], np.asarray(rec_x.inst)[both])


@pytest.mark.parametrize("wide", [False, True])
def test_big_blas_paged_resolve(big_blas_scene, wide):
    (rp, paged, proot, flat, froot, ss, instances, slots,
     o, d, t_max) = big_blas_scene
    bound = 2 * instances.capacity * (flat.leaf_rows.shape[0] + 2) + 4096
    table = rp.materials.table()
    out = TP.trace_resolve_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss, max_steps=bound,
        n_slots=slots.shape[1], wide=wide)
    tracer = A.SceneTracer(flat, slots, table, root_code=froot,
                           stack_size=ss, use_pallas=False)
    rec = tracer.trace(o, d, t_max)
    surf = tracer.resolve(rec, o, d)
    hk = np.asarray(out["prim"]) >= 0
    np.testing.assert_array_equal(hk, np.asarray(surf.valid))
    np.testing.assert_array_equal(
        np.asarray(out["material"])[hk], np.asarray(surf.material)[hk])
    np.testing.assert_allclose(
        np.asarray(out["uv"])[hk], np.asarray(surf.uv)[hk],
        rtol=1e-3, atol=1e-4)
    n = np.asarray(out["normal"])[hk]
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    dd = np.asarray(d)[hk]
    facing = (n * dd).sum(-1) < 0.0
    n = np.where(facing[:, None], n, -n)
    np.testing.assert_allclose(
        n, np.asarray(surf.normal)[hk], rtol=1e-3, atol=2e-3)


def test_big_blas_tracer_protocol(big_blas_scene):
    """PagedSceneTracer end-to-end on a chunked-BLAS scene (any-hit too)."""
    (rp, paged, proot, flat, froot, ss, instances, slots,
     o, d, t_max) = big_blas_scene
    tracer = A.PagedSceneTracer(paged, slots, rp.materials.table(),
                                root_code=proot, stack_size=ss,
                                use_pallas=True, wide=True)
    ref = A.SceneTracer(flat, slots, rp.materials.table(), root_code=froot,
                        stack_size=ss, use_pallas=False)
    monkey_ok = TP.paged_traversal_ok(paged, o.shape[0])
    # CPU backend: the budget fn returns False off-TPU; call kernels direct
    rec_a = TP.trace_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss,
        max_steps=tracer._step_bound(), any_hit=True, wide=True)
    rec_r = ref.trace(o, d, t_max, any_hit=True)
    np.testing.assert_array_equal(np.asarray(rec_a.hit),
                                  np.asarray(rec_r.hit))
