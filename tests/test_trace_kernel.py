"""Packet-traversal kernel tests (Pallas interpreter on CPU).

Ports scripts/validate_trace_kernel.py into the CI suite (VERDICT r2 item 5):
the packet kernels (ops/trace_kernel.py) were previously validated only by
hand-run TPU scripts, so a traversal regression would ship through a green
suite. These tests run the kernels in interpret mode (INTERPRET hook,
mirroring ops/raster_exact.py) against the XLA lockstep reference
``accel.trace_scene`` on the example scene:

  * closest-hit parity (t / prim / inst / bary)
  * fused trace+resolve attribute parity vs the XLA resolve
  * any-hit semantics (hit set == closest-hit set; t is *a* hit)
  * in-kernel leaf alpha cutout vs the XLA alpha_test path
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.ops import accel as A
from paperrenderer_tpu.ops import trace_kernel as TK
from paperrenderer_tpu.ops.trace import raygen


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(TK, "INTERPRET", True)


def _assemble(scene, capacity_masks=None):
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    tri_attr = A.build_tri_attr(scene)
    masks = capacity_masks or [jnp.ones(instances.capacity, bool)]
    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), masks, tri_attr,
    )
    ss = A.required_stack_size(meta, instances.capacity)
    return rts, roots, ss, instances


@pytest.fixture(scope="module")
def example():
    """Example scene (5 instances, 2 sharing the sphere BLAS via scene
    layout) + one packet of primary rays."""
    from examples.render_scene import build_example_scene

    rp, cam = build_example_scene(64, 64)
    rts, roots, ss, instances = _assemble(rp.scene)
    o, d = raygen(cam.matrices, 32, 32)           # 1024 rays = 1 packet
    t_max = jnp.full(o.shape[0], 1000.0)
    return rp, cam, rts, roots, ss, instances, o, d, t_max


@pytest.mark.parametrize("wide", [False, True])
def test_packet_matches_xla_closest_hit(example, wide):
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    n_inst = instances.capacity
    rec_p = TK.trace_scene_pallas(
        rts, o, d, t_max, root_code=roots[0], stack_size=ss,
        max_steps=TK.traversal_step_bound(rts, n_inst), wide=wide)
    rec_x = A.trace_scene(
        rts, o, d, t_max, root_code=roots[0], stack_size=ss)
    hp = np.asarray(rec_p.hit)
    hx = np.asarray(rec_x.hit)
    np.testing.assert_array_equal(hp, hx)
    assert hp.any(), "ray set misses the scene entirely — bad fixture"
    both = hp & hx
    np.testing.assert_allclose(
        np.asarray(rec_p.t)[both], np.asarray(rec_x.t)[both],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(rec_p.prim)[both], np.asarray(rec_x.prim)[both])
    np.testing.assert_array_equal(
        np.asarray(rec_p.inst)[both], np.asarray(rec_x.inst)[both])
    np.testing.assert_allclose(
        np.asarray(rec_p.bary)[both], np.asarray(rec_x.bary)[both],
        rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("wide", [False, True])
def test_fused_resolve_matches_xla_resolve(example, wide):
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    slots = rp._slot_material_array(instances.capacity)
    table = rp.materials.table()
    out = TK.trace_resolve_scene_pallas(
        rts, slots, o, d, t_max, root_code=roots[0], stack_size=ss,
        max_steps=TK.traversal_step_bound(rts, instances.capacity),
        wide=wide)

    tracer = A.SceneTracer(
        rts, slots, table, root_code=roots[0], stack_size=ss,
        use_pallas=False)
    rec = tracer.trace(o, d, t_max)
    surf = tracer.resolve(rec, o, d)

    hit_k = np.asarray(out["prim"]) >= 0
    hit_x = np.asarray(surf.valid)
    np.testing.assert_array_equal(hit_k, hit_x)
    h = hit_k
    np.testing.assert_allclose(
        np.asarray(out["t"])[h], np.asarray(surf.t)[h], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(out["material"])[h], np.asarray(surf.material)[h])
    np.testing.assert_allclose(
        np.asarray(out["uv"])[h], np.asarray(surf.uv)[h],
        rtol=1e-3, atol=1e-4)
    # kernel normals are unnormalized world-space (M^-1)^T n_obj; normalize
    # and flip toward facing like SceneTracer.trace_resolve does
    n = np.asarray(out["normal"])[h]
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    dd = np.asarray(d)[h]
    facing = (n * dd).sum(-1) < 0.0
    n = np.where(facing[:, None], n, -n)
    np.testing.assert_allclose(
        n, np.asarray(surf.normal)[h], rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("wide", [False, True])
def test_any_hit_semantics(example, wide):
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    bound = TK.traversal_step_bound(rts, instances.capacity)
    rec_any = TK.trace_scene_pallas(
        rts, o, d, t_max, root_code=roots[0], stack_size=ss,
        any_hit=True, max_steps=bound, wide=wide)
    rec_closest = A.trace_scene(
        rts, o, d, t_max, root_code=roots[0], stack_size=ss)
    # any-hit must report a hit exactly when a hit exists...
    np.testing.assert_array_equal(
        np.asarray(rec_any.hit), np.asarray(rec_closest.hit))
    # ...and its t is a valid hit parameter (>= the closest, <= t_max)
    h = np.asarray(rec_any.hit)
    ta = np.asarray(rec_any.t)[h]
    tc = np.asarray(rec_closest.t)[h]
    assert (ta >= tc - 1e-4).all()
    assert (ta <= np.asarray(t_max)[h] + 1e-4).all()


def test_active_mask_disables_rays(example):
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    active = (jnp.arange(o.shape[0]) % 2) == 0
    rec = TK.trace_scene_pallas(
        rts, o, d, t_max, root_code=roots[0], stack_size=ss, active=active,
        max_steps=TK.traversal_step_bound(rts, instances.capacity))
    hp = np.asarray(rec.hit)
    assert not hp[1::2].any(), "inactive rays must never hit"


@pytest.mark.parametrize("wide", [False, True])
def test_leaf_cutout_in_kernel(wide):
    """In-kernel leaf alpha cutout == XLA alpha_test path (leaf.rahit)."""
    from paperrenderer_tpu.core import (
        Material, MaterialRegistry, Model, ModelInstance, Scene, SHADE_LEAF,
        make_plane,
    )
    from paperrenderer_tpu.render import RenderPass

    scene = Scene()
    registry = MaterialRegistry()
    panel = Model.from_mesh(scene.arena, *make_plane(size=2.0))
    rp = RenderPass(scene, registry, width=8, height=8)
    leaf = Material("leaf", emissive=(0, 1, 0), shading_model=SHADE_LEAF)
    back = Material("back", emissive=(1, 0, 0))
    li = ModelInstance(panel)
    li.set_transform(pos=(0, 0, 1.0))
    rp.add_instance(li, {0: leaf.instance()})
    bg = ModelInstance(panel)
    rp.add_instance(bg, {0: back.instance()})
    rts, roots, ss, instances = _assemble(scene)
    slots = rp._slot_material_array(instances.capacity)
    table = rp.materials.table()

    # rays straight down over the panel (u-v sweep of the leaf pattern)
    n = 32
    xs = jnp.linspace(-0.95, 0.95, n)
    ys = jnp.linspace(-0.95, 0.95, n)
    gx, gy = jnp.meshgrid(xs, ys)
    o = jnp.stack([gx.ravel(), gy.ravel(), jnp.full(n * n, 5.0)], axis=-1)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n * n, 1))
    t_max = jnp.full(n * n, 100.0)

    out = TK.trace_resolve_scene_pallas(
        rts, slots, o, d, t_max, root_code=roots[0], stack_size=ss,
        shading_model=table.shading_model, wide=wide,
        max_steps=TK.traversal_step_bound(rts, instances.capacity))

    tracer = A.SceneTracer(
        rts, slots, table, root_code=roots[0], stack_size=ss,
        leaf_cutout=True, use_pallas=False)
    rec = tracer.trace(o, d, t_max, use_alpha=True)

    inst_k = np.asarray(out["inst"])
    inst_x = np.asarray(rec.inst)
    np.testing.assert_array_equal(inst_k, inst_x)
    # the pattern must actually cut out somewhere and keep somewhere
    leaf_idx = li.index
    bg_idx = bg.index
    assert (inst_k == leaf_idx).any(), "no leaf hits — pattern fully cut"
    assert (inst_k == bg_idx).any(), "no cutout — background never visible"


def test_image_mode_matches_flat(example):
    """Image packet grouping ((8, 128) pixel tiles via index_map) returns
    identical per-ray results to the flat row-strip grouping — grouping only
    changes packet membership, never the per-ray math."""
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    W, H = 128, 32                               # 4096 rays, 4 image tiles
    o4, d4 = raygen(cam.matrices, W, H)
    t4 = jnp.full(o4.shape[0], 1000.0)
    ms = TK.traversal_step_bound(rts, instances.capacity)
    assert TK.image_mode_ok((H, W), o4.shape[0])
    rec_f = TK.trace_scene_pallas(
        rts, o4, d4, t4, root_code=roots[0], stack_size=ss, max_steps=ms)
    rec_i = TK.trace_scene_pallas(
        rts, o4, d4, t4, root_code=roots[0], stack_size=ss, max_steps=ms,
        image_shape=(H, W))
    np.testing.assert_array_equal(np.asarray(rec_i.prim),
                                  np.asarray(rec_f.prim))
    np.testing.assert_array_equal(np.asarray(rec_i.inst),
                                  np.asarray(rec_f.inst))
    np.testing.assert_allclose(np.asarray(rec_i.t), np.asarray(rec_f.t),
                               rtol=1e-6, atol=1e-6)
    assert np.asarray(rec_i.hit).any()


def test_image_mode_resolve_matches_flat(example):
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    W, H = 128, 32
    o4, d4 = raygen(cam.matrices, W, H)
    t4 = jnp.full(o4.shape[0], 1000.0)
    ms = TK.traversal_step_bound(rts, instances.capacity)
    slots = rp._slot_material_array(instances.capacity)
    out_f = TK.trace_resolve_scene_pallas(
        rts, slots, o4, d4, t4, root_code=roots[0], stack_size=ss,
        max_steps=ms)
    out_i = TK.trace_resolve_scene_pallas(
        rts, slots, o4, d4, t4, root_code=roots[0], stack_size=ss,
        max_steps=ms, image_shape=(H, W))
    for k in ("t", "prim", "inst", "material"):
        np.testing.assert_array_equal(np.asarray(out_i[k]),
                                      np.asarray(out_f[k]))
    np.testing.assert_allclose(np.asarray(out_i["normal"]),
                               np.asarray(out_f["normal"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_i["uv"]),
                               np.asarray(out_f["uv"]), atol=1e-6)


def test_subpacket_grouping_matches_flat(example):
    """sub_cap>1 groups several packets per grid step (fori_loop over the
    sub index); results must be bit-identical to the one-packet-per-step
    layout, including the trailing partial group (pad rays park dead).
    sub_cap is a jit STATIC (a module-var sweep would hit the jit cache
    and compare a result against itself)."""
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    from examples.render_scene import build_example_scene

    # 40x64 = 2560 rays: 3 packets -> one sub=2 group + one partial group
    _, cam2 = build_example_scene(64, 40)
    o2, d2 = raygen(cam2.matrices, 64, 40)
    tm = jnp.full(o2.shape[0], 1000.0)
    kw = dict(root_code=roots[0], stack_size=ss,
              max_steps=TK.traversal_step_bound(rts, instances.capacity))

    rec1 = TK.trace_scene_pallas(rts, o2, d2, tm, sub_cap=1, **kw)
    rec2 = TK.trace_scene_pallas(rts, o2, d2, tm, sub_cap=2, **kw)

    np.testing.assert_array_equal(np.asarray(rec1.hit), np.asarray(rec2.hit))
    np.testing.assert_array_equal(np.asarray(rec1.prim),
                                  np.asarray(rec2.prim))
    np.testing.assert_array_equal(np.asarray(rec1.inst),
                                  np.asarray(rec2.inst))
    h = np.asarray(rec1.hit)
    np.testing.assert_allclose(np.asarray(rec1.t)[h], np.asarray(rec2.t)[h],
                               rtol=0, atol=0)

    # fused resolve path too
    slots = rp._slot_material_array(instances.capacity)
    out1 = TK.trace_resolve_scene_pallas(rts, slots, o2, d2, tm,
                                         sub_cap=1, **kw)
    out2 = TK.trace_resolve_scene_pallas(rts, slots, o2, d2, tm,
                                         sub_cap=2, **kw)
    for k in ("t", "prim", "inst", "material"):
        np.testing.assert_array_equal(np.asarray(out1[k]),
                                      np.asarray(out2[k]))


@pytest.mark.parametrize("wide", [False, True])
def test_occlusion_bundle_matches_per_sample_anyhit(example, wide):
    """The origin-shared any-hit bundle kernel must report exactly the
    occlusion bits S per-sample any-hit traces report (XLA lockstep
    reference), including t_cap semantics (occluders beyond the light do
    not block) and inactive lanes (all-occluded by convention)."""
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    r = o.shape[0]
    key = jax.random.PRNGKey(3)
    # three jittered sample directions around the primary direction
    dirs = []
    for s in range(3):
        j = jax.random.normal(jax.random.fold_in(key, s), (r, 3)) * 0.05
        sd = d + j
        dirs.append(sd / jnp.linalg.norm(sd, axis=-1, keepdims=True))
    # mixed t_caps: far, mid, short (exercises per-sample prune planes)
    t_caps = [jnp.full((r,), 1000.0), jnp.full((r,), 6.0),
              jnp.full((r,), 2.5)]
    active = (jnp.arange(r) % 3) != 0

    bits = TK.trace_shadow_bundle_pallas(
        rts, o, tuple(dirs), tuple(t_caps), root_code=roots[0],
        stack_size=ss, active=active, wide=wide,
        max_steps=TK.traversal_step_bound(rts, instances.capacity))
    bits = np.asarray(bits)

    for s in range(3):
        rec = A.trace_scene(
            rts, o, dirs[s], t_caps[s], root_code=roots[0], stack_size=ss,
            any_hit=True, active=active)
        ref_occ = np.asarray(rec.hit) | ~np.asarray(active)
        got = (bits >> s) & 1
        np.testing.assert_array_equal(got.astype(bool), ref_occ)


def test_occlusion_bundle_subpackets(example):
    """Bundle kernel under sub-packet grouping (partial trailing group)."""
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    from examples.render_scene import build_example_scene

    _, cam2 = build_example_scene(64, 40)
    o2, d2 = raygen(cam2.matrices, 64, 40)
    tm = jnp.full(o2.shape[0], 1000.0)
    kw = dict(root_code=roots[0], stack_size=ss,
              max_steps=TK.traversal_step_bound(rts, instances.capacity))
    b1 = TK.trace_shadow_bundle_pallas(rts, o2, (d2,), (tm,), sub_cap=1,
                                       **kw)
    b2 = TK.trace_shadow_bundle_pallas(rts, o2, (d2,), (tm,), sub_cap=2,
                                       **kw)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


@pytest.mark.parametrize("wide", [False, True])
def test_mixed_bundle_occ_plus_ao_closest(example, wide):
    """The heterogeneous bundle (any-hit occlusion samples + closest-t AO
    samples in ONE traversal) must report exactly what per-sample traces
    report: occlusion bits from any-hit traces; AO t = the closest hit t
    (cap when nothing hits within it, -3e38 on parked lanes)."""
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    r = o.shape[0]
    key = jax.random.PRNGKey(11)
    occ_ds, occ_tcs = [], []
    for s in range(2):
        j = jax.random.normal(jax.random.fold_in(key, s), (r, 3)) * 0.05
        sd = d + j
        occ_ds.append(sd / jnp.linalg.norm(sd, axis=-1, keepdims=True))
    occ_tcs = [jnp.full((r,), 1000.0), jnp.full((r,), 4.0)]
    ao_ds = []
    for s in range(2):
        j = jax.random.normal(jax.random.fold_in(key, 50 + s), (r, 3))
        sd = d + 0.3 * j
        ao_ds.append(sd / jnp.linalg.norm(sd, axis=-1, keepdims=True))
    ao_tcs = [jnp.full((r,), 1000.0), jnp.full((r,), 3.0)]
    occ_act = (jnp.arange(r) % 3) != 0
    ao_act = (jnp.arange(r) % 4) != 1

    bits, ao_ts = TK.trace_bundle_pallas(
        rts, o, tuple(occ_ds), tuple(occ_tcs), tuple(ao_ds), tuple(ao_tcs),
        root_code=roots[0], stack_size=ss,
        occ_actives=(occ_act, occ_act), ao_actives=(ao_act, ao_act),
        wide=wide, max_steps=TK.traversal_step_bound(rts, instances.capacity))
    bits = np.asarray(bits)

    for s in range(2):
        rec = A.trace_scene(
            rts, o, occ_ds[s], occ_tcs[s], root_code=roots[0], stack_size=ss,
            any_hit=True, active=occ_act)
        ref_occ = np.asarray(rec.hit) | ~np.asarray(occ_act)
        np.testing.assert_array_equal(((bits >> s) & 1).astype(bool), ref_occ)
    for s in range(2):
        rec = A.trace_scene(
            rts, o, ao_ds[s], ao_tcs[s], root_code=roots[0], stack_size=ss,
            active=ao_act)
        ref_t = np.where(np.asarray(rec.hit), np.asarray(rec.t),
                         np.asarray(ao_tcs[s]))
        ref_t = np.where(np.asarray(ao_act), ref_t, -3e38)
        got = np.asarray(ao_ts[s])
        np.testing.assert_allclose(got, ref_t, rtol=2e-5, atol=1e-4)


def test_shadow_and_ao_fused_matches_separate(example):
    """trace.shadow_and_ao (fused bundle) must match shadow_visibility +
    ambient_occlusion run separately, up to the documented AO origin epsilon
    (5e-3 vs 1e-3 along the normal)."""
    from paperrenderer_tpu.ops import trace as T
    from paperrenderer_tpu.ops.shading import Lights

    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    slots = rp._slot_material_array(instances.capacity)
    ctx = A.SceneTracer(rts, slots, rp.materials.table(),
                        root_code=roots[0], stack_size=ss, use_pallas=True)
    surf = ctx.trace_resolve(o, d, t_max)
    lights = Lights.make(
        [dict(position=(4.0, 5.0, 3.0), color=(40.0, 38.0, 30.0),
              radius=0.5, bounds=30.0),
         dict(position=(-6.0, 2.0, 4.0), color=(10.0, 10.0, 18.0),
              radius=0.0, bounds=30.0)],
        ambient=(1.0, 1.0, 1.0, 0.15),
    )
    key = jax.random.PRNGKey(5)
    ao_key = jax.random.fold_in(key, 9)
    mats = rp.materials.table()
    svis_f, ao_f = T.shadow_and_ao(
        surf, ctx, mats, lights, key, ao_key,
        shadow_samples=2, ao_samples=2, ao_radius=2.0)
    svis_s = T.shadow_visibility(surf, ctx, lights, key, 2)
    ao_s = T.ambient_occlusion(surf, ctx, mats, ao_key, 2, 2.0)
    np.testing.assert_allclose(np.asarray(svis_f), np.asarray(svis_s),
                               atol=1e-6)
    # AO origins differ by 4e-3 * normal: tolerance covers the epsilon band
    np.testing.assert_allclose(np.asarray(ao_f), np.asarray(ao_s), atol=0.03)
    assert float(jnp.mean(jnp.abs(ao_f - ao_s))) < 5e-3


@pytest.mark.parametrize("wide", [False, True])
def test_full_bundle_with_resolve_sample(example, wide):
    """The mega-bundle (occlusion + AO + one closest/resolve sample in ONE
    traversal) must reproduce the standalone fused-resolve kernel's output
    for the resolve sample and per-sample traces for the rest."""
    rp, cam, rts, roots, ss, instances, o, d, t_max = example
    r = o.shape[0]
    key = jax.random.PRNGKey(21)
    j = jax.random.normal(jax.random.fold_in(key, 0), (r, 3)) * 0.05
    sd = d + j
    occ_ds = (sd / jnp.linalg.norm(sd, axis=-1, keepdims=True),)
    occ_tcs = (jnp.full((r,), 8.0),)
    j2 = jax.random.normal(jax.random.fold_in(key, 1), (r, 3))
    ad = d + 0.3 * j2
    ao_ds = (ad / jnp.linalg.norm(ad, axis=-1, keepdims=True),)
    ao_tcs = (jnp.full((r,), 2.0),)
    rs_act = (jnp.arange(r) % 5) != 2
    slots = rp._slot_material_array(instances.capacity)

    kw = dict(root_code=roots[0], stack_size=ss, wide=wide,
              max_steps=TK.traversal_step_bound(rts, instances.capacity))
    bits, ao_ts, rs = TK.trace_bundle_pallas(
        rts, o, occ_ds, occ_tcs, ao_ds, ao_tcs, d, t_max, slots,
        rs_active=rs_act, **kw)

    ref = TK.trace_resolve_scene_pallas(rts, slots, o, d, t_max,
                                        active=rs_act, **kw)
    for k in ("t", "prim", "inst", "material"):
        np.testing.assert_array_equal(np.asarray(rs[k]), np.asarray(ref[k]))
    np.testing.assert_allclose(np.asarray(rs["uv"]), np.asarray(ref["uv"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs["normal"]),
                               np.asarray(ref["normal"]),
                               rtol=1e-4, atol=1e-5)

    rec = A.trace_scene(rts, o, occ_ds[0], occ_tcs[0], root_code=roots[0],
                        stack_size=ss, any_hit=True)
    np.testing.assert_array_equal(((np.asarray(bits) >> 0) & 1).astype(bool),
                                  np.asarray(rec.hit))
    rec2 = A.trace_scene(rts, o, ao_ds[0], ao_tcs[0], root_code=roots[0],
                         stack_size=ss)
    ref_t = np.where(np.asarray(rec2.hit), np.asarray(rec2.t), 2.0)
    np.testing.assert_allclose(np.asarray(ao_ts[0]), ref_t,
                               rtol=2e-5, atol=1e-4)
