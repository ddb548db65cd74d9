"""Secondary-wavefront group compaction (ops/compaction.py).

Compaction is a scheduling-only transform: rays are permuted at 128-lane
group granularity before the traversal and un-permuted after, with sample
directions built BEFORE the reorder — per-ray results must be identical
to the uncompacted path (the reference launches the same rays in one
vkCmdTraceRaysKHR grid; ray order is not observable, RayTrace.cpp:34-95).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.ops import compaction as C
from paperrenderer_tpu.ops import trace as T


def test_order_is_stable_partition():
    rng = np.random.default_rng(0)
    live = jnp.asarray(rng.random(40 * C.GROUP) < 0.1)
    order, inv = C.compaction_order(live)
    g_live = np.asarray(jnp.any(live.reshape(-1, C.GROUP), axis=1))
    o = np.asarray(order)
    # a permutation; live groups lead; stable within each class
    assert sorted(o.tolist()) == list(range(40))
    n_live = int(g_live.sum())
    assert g_live[o[:n_live]].all() and not g_live[o[n_live:]].any()
    assert list(o[:n_live]) == sorted(o[:n_live])
    assert list(o[n_live:]) == sorted(o[n_live:])
    # inverse really inverts
    x = jnp.arange(40 * C.GROUP, dtype=jnp.float32)
    xp = C.permute_flat([x], order)[0]
    assert np.array_equal(np.asarray(C.permute_flat([xp], inv)[0]),
                          np.asarray(x))


def test_permute_flat_mixed_dtypes():
    rng = np.random.default_rng(1)
    r = 16 * C.GROUP
    f = jnp.asarray(rng.standard_normal(r), jnp.float32)
    i = jnp.asarray(rng.integers(0, 9, r), jnp.int32)
    b = jnp.asarray(rng.random(r) < 0.5)
    order, inv = C.compaction_order(b)
    pf, pi, pb = C.permute_flat([f, i, b], order)
    assert pf.dtype == f.dtype and pi.dtype == i.dtype and pb.dtype == b.dtype
    perm = np.repeat(np.asarray(order), C.GROUP) * C.GROUP + np.tile(
        np.arange(C.GROUP), 16)
    assert np.array_equal(np.asarray(pf), np.asarray(f)[perm])
    assert np.array_equal(np.asarray(pi), np.asarray(i)[perm])
    assert np.array_equal(np.asarray(pb), np.asarray(b)[perm])
    uf, ub = C.permute_flat([pf, pb], inv)
    assert np.array_equal(np.asarray(uf), np.asarray(f))
    assert np.array_equal(np.asarray(ub), np.asarray(b))


@pytest.fixture(scope="module")
def rt_example():
    from examples.render_rt import build_rt_scene

    # 128x128 -> 16384 rays: past MIN_RAYS, so compaction actually runs
    eng, rt, cam = build_rt_scene(128, 128)
    return eng, rt, cam


def test_trace_frame_parity_compact_vs_not(rt_example):
    """Full RT frame with/without compaction is per-ray identical: same
    rays, same RNG sequence, only the packet grouping changes. Run
    stage-by-stage (eager) the outputs are bitwise equal; the composed
    jitted frames may differ by XLA fusion noise (the two programs fuse
    differently around the added permutes — measured 7e-5 max on CPU,
    exactly 0 on TPU), so the pixel tolerance here is fusion-level, far
    below the golden-image band."""
    eng, rt, cam = rt_example
    rt.compact_secondary = True   # round 5: default now False (pack=2 made
    rt._frame = 0  # pin the per-frame RNG key for both renders
    img_on, _ = rt.render(cam)    # the permutes a net loss on TPU) — parity
    rt.compact_secondary = False  # must hold either way
    rt._frame = 0
    img_off, _ = rt.render(cam)
    a, b = np.asarray(img_on), np.asarray(img_off)
    assert np.abs(a - b).max() <= 5e-4, np.abs(a - b).max()


def test_stage_parity_is_exact(rt_example):
    """Eager (un-jitted) stage outputs ARE bitwise equal with/without
    compaction — the transform itself is exact; only whole-program fusion
    differs (see test above)."""
    eng, rt, cam = rt_example
    from paperrenderer_tpu.ops import accel as A

    scene = eng.scene
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    tri_attr = A.build_tri_attr(scene)
    masks = [jnp.ones(instances.capacity, bool)]
    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), masks, tri_attr)
    ss = A.required_stack_size(meta, instances.capacity)
    ctx = A.SceneTracer(rts, rt._slot_material_array(instances.capacity),
                        rt.materials.table(), root_code=roots[0],
                        stack_size=ss, use_pallas=False)
    mats = rt.materials.table()
    tiled = T.pick_tile(128, 128)
    o, d = T.raygen(cam.matrices, 128, 128, tile_order=tiled)
    tm = jnp.full(o.shape[0], 1000.0)
    surf = ctx.trace_resolve(o, d, tm)
    key = jax.random.PRNGKey(3)
    sv1, ao1 = T.shadow_and_ao(surf, ctx, mats, rt.lights, key, key,
                               shadow_samples=2, ao_samples=1,
                               ao_radius=2.0, compact=False)
    sv2, ao2 = T.shadow_and_ao(surf, ctx, mats, rt.lights, key, key,
                               shadow_samples=2, ao_samples=1,
                               ao_radius=2.0, compact=True)
    np.testing.assert_array_equal(np.asarray(sv1), np.asarray(sv2))
    np.testing.assert_array_equal(np.asarray(ao1), np.asarray(ao2))
    rdir = T._reflection_dir(surf, mats, cam.matrices.cam_pos, key, 0)
    o2 = surf.world_pos + surf.normal * 5e-3
    h1 = ctx.trace_resolve(o2, rdir, tm, active=surf.valid)
    h2 = T._compact_trace_resolve(ctx, o2, rdir, tm, active=surf.valid,
                                  use_alpha=False, cull_mask=0xFF)
    for f in ("world_pos", "normal", "uv", "material", "valid", "t"):
        np.testing.assert_array_equal(np.asarray(getattr(h1, f)),
                                      np.asarray(getattr(h2, f)))
    # the separate-pass surfaces (used by paged/sharded tracers without the
    # fused bundle) compact identically
    v1 = T.shadow_visibility(surf, ctx, rt.lights, key, 2, compact=False)
    v2 = T.shadow_visibility(surf, ctx, rt.lights, key, 2, compact=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    a1 = T.ambient_occlusion(surf, ctx, mats, key, 2, 2.0, compact=False)
    a2 = T.ambient_occlusion(surf, ctx, mats, key, 2, 2.0, compact=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_stage_parity_is_exact_pallas(rt_example, monkeypatch):
    """Same bitwise stage parity on the PACKET KERNEL path (the path that
    actually runs on TPU): regrouping changes per-packet traversal order
    and which packets share a stack, so this asserts the kernel's winner
    updates really are order-independent — not just the XLA fallback's.
    Runs the kernels in the Pallas interpreter (as test_trace_kernel.py)
    with the backend gate bypassed."""
    from paperrenderer_tpu.ops import accel as A
    from paperrenderer_tpu.ops import trace_kernel as TK

    monkeypatch.setattr(TK, "INTERPRET", True)
    monkeypatch.setattr(TK, "pallas_traversal_ok",
                        lambda scene, n: n >= TK.PACKET)
    monkeypatch.setattr(TK, "pallas_resolve_ok",
                        lambda scene, n, *a, **kw: n >= TK.PACKET)

    eng, rt, cam = rt_example
    scene = eng.scene
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    tri_attr = A.build_tri_attr(scene)
    masks = [jnp.ones(instances.capacity, bool)]
    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), masks, tri_attr)
    ss = A.required_stack_size(meta, instances.capacity)
    ctx = A.SceneTracer(rts, rt._slot_material_array(instances.capacity),
                        rt.materials.table(), root_code=roots[0],
                        stack_size=ss, use_pallas=True)
    mats = rt.materials.table()
    side = 64            # 4096 rays: exactly compaction.MIN_RAYS
    tiled = T.pick_tile(side, side)
    o, d = T.raygen(cam.matrices, side, side, tile_order=tiled)
    tm = jnp.full(o.shape[0], 1000.0)
    surf = ctx.trace_resolve(o, d, tm)
    key = jax.random.PRNGKey(3)
    sv1, ao1 = T.shadow_and_ao(surf, ctx, mats, rt.lights, key, key,
                               shadow_samples=2, ao_samples=1,
                               ao_radius=2.0, compact=False)
    sv2, ao2 = T.shadow_and_ao(surf, ctx, mats, rt.lights, key, key,
                               shadow_samples=2, ao_samples=1,
                               ao_radius=2.0, compact=True)
    np.testing.assert_array_equal(np.asarray(sv1), np.asarray(sv2))
    np.testing.assert_array_equal(np.asarray(ao1), np.asarray(ao2))
    rdir = T._reflection_dir(surf, mats, cam.matrices.cam_pos, key, 0)
    o2 = surf.world_pos + surf.normal * 5e-3
    h1 = ctx.trace_resolve(o2, rdir, tm, active=surf.valid)
    h2 = T._compact_trace_resolve(ctx, o2, rdir, tm, active=surf.valid,
                                  use_alpha=False, cull_mask=0xFF)
    for f in ("world_pos", "normal", "uv", "material", "valid", "t"):
        np.testing.assert_array_equal(np.asarray(getattr(h1, f)),
                                      np.asarray(getattr(h2, f)))
