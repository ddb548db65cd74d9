"""Two-level BLAS/TLAS correctness: traversal vs brute-force intersection.

The reference's analogous guarantees (driver AS correctness) are exercised by
eye in its example app; here every trace is checked against an exhaustive
Möller-Trumbore over all world-space triangles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paperrenderer_tpu.core.geometry import (
    GeometryArena, make_cube, make_icosphere, make_plane,
)
from paperrenderer_tpu.core.model import Model, ModelInstance
from paperrenderer_tpu.core.scene import Scene
from paperrenderer_tpu.core.transforms import trs_to_mat34
from paperrenderer_tpu.ops import accel as A


def _build_scene(n_instances=7, seed=0, unique=()):
    rng = np.random.RandomState(seed)
    scene = Scene(use_native=False)
    models = [
        Model.from_mesh(scene.arena, *make_cube(1.0), name="cube"),
        Model.from_mesh(scene.arena, *make_icosphere(0.6, 1), name="sphere"),
        Model.from_mesh(scene.arena, *make_plane(2.0, 2), name="plane"),
    ]
    for m in models:
        scene.register_model(m)
    instances = []
    for i in range(n_instances):
        inst = ModelInstance(models[i % 3], unique_geometry=(i in unique))
        q = rng.randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        inst.set_transform(
            pos=rng.uniform(-3, 3, 3).astype(np.float32),
            scale=rng.uniform(0.5, 1.8, 3).astype(np.float32),
            quat=q,
        )
        scene.add_instance(inst)
        instances.append(inst)
    return scene, models, instances


def _world_tris(scene):
    """All live world-space triangles: (inst_id, arena_tri, v0, v1, v2)."""
    arena = scene.arena
    out = []
    for inst in scene.instances:
        m = np.asarray(
            trs_to_mat34(
                jnp.asarray(inst.position)[None],
                jnp.asarray(inst.scale)[None],
                jnp.asarray(inst.rotation)[None],
            )
        )[0]
        for mm in inst.model.lods[0].meshes:
            h = mm.handle
            idx = arena._idx[h.tri_offset : h.tri_offset + h.tri_count]
            for k in range(h.tri_count):
                vs = arena._pos[idx[k]]  # [3, 3]
                w = vs @ m[:, :3].T + m[:, 3]
                out.append((inst.index, h.tri_offset + k, w[0], w[1], w[2]))
    return out


def _brute_force(tris, o, d, t_min=1e-3, t_max=1e9):
    """Closest-hit reference. Returns (t, prim, inst) per ray."""
    r = o.shape[0]
    best_t = np.full(r, np.inf)
    best_prim = np.full(r, -1, np.int64)
    best_inst = np.full(r, -1, np.int64)
    for inst_id, tri_id, v0, v1, v2 in tris:
        e1 = v1 - v0
        e2 = v2 - v0
        p = np.cross(d, e2)
        det = np.sum(e1 * p, axis=-1)
        ok = np.abs(det) > 1e-12
        inv = 1.0 / np.where(ok, det, 1.0)
        s = o - v0
        u = np.sum(s * p, axis=-1) * inv
        q = np.cross(s, e1)
        v = np.sum(d * q, axis=-1) * inv
        t = np.sum(e2 * q, axis=-1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < t_max)
        win = hit & (t < best_t)
        best_t = np.where(win, t, best_t)
        best_prim = np.where(win, tri_id, best_prim)
        best_inst = np.where(win, inst_id, best_inst)
    return best_t, best_prim, best_inst


def _assemble(scene, masks=None, time=None, animate=None):
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    for a in meta.anim:
        inst_blas[a.instance_index] = a.blas_id
    if masks is None:
        masks = [jnp.ones(instances.capacity, bool)]
    tri_attr = A.build_tri_attr(scene)
    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), masks, tri_attr, time=time, animate=animate,
    )
    ss = A.required_stack_size(meta, instances.capacity)
    return rts, roots, ss, meta


def _rays(seed=1, r=96):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-6, 6, (r, 3)).astype(np.float32)
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_trace_matches_brute_force():
    scene, _, _ = _build_scene(7)
    rts, roots, ss, _ = _assemble(scene)
    o, d = _rays()
    rec = A.trace_scene(
        rts, jnp.asarray(o), jnp.asarray(d), jnp.full(o.shape[0], 1e9),
        root_code=roots[0], stack_size=ss,
    )
    bt, bp, bi = _brute_force(_world_tris(scene), o, d)
    hit = bp >= 0
    assert np.array_equal(np.asarray(rec.hit), hit)
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], bt[hit], rtol=2e-4, atol=2e-4)
    # prim/inst agree except exact ties
    agree = (np.asarray(rec.prim) == bp) & (np.asarray(rec.inst) == bi)
    assert np.mean(agree[hit]) > 0.97


def test_any_hit_and_tmax():
    scene, _, _ = _build_scene(5, seed=3)
    rts, roots, ss, _ = _assemble(scene)
    o, d = _rays(seed=4)
    t_max = np.full(o.shape[0], 2.5, np.float32)
    rec = A.trace_scene(
        rts, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
        root_code=roots[0], stack_size=ss, any_hit=True,
    )
    bt, bp, _ = _brute_force(_world_tris(scene), o, d, t_max=2.5)
    # any-hit must agree on OCCLUSION (not on which prim)
    assert np.array_equal(np.asarray(rec.hit), bp >= 0)


def test_tlas_refit_moves_instance():
    scene, _, instances = _build_scene(4, seed=7)
    o, d = _rays(seed=8, r=64)
    instances[0].set_transform(pos=(10.0, 0.0, 0.0))
    rts, roots, ss, _ = _assemble(scene)
    rec = A.trace_scene(
        rts, jnp.asarray(o), jnp.asarray(d), jnp.full(o.shape[0], 1e9),
        root_code=roots[0], stack_size=ss,
    )
    bt, bp, bi = _brute_force(_world_tris(scene), o, d)
    assert np.array_equal(np.asarray(rec.hit), bp >= 0)
    hit = bp >= 0
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], bt[hit], rtol=2e-4, atol=2e-4)


def test_multi_tlas_independent_sets():
    """Two TLASes over disjoint instance sets trace independently
    (reference RayTrace.h:50-56 addNewTLAS semantics)."""
    scene, _, instances = _build_scene(6, seed=11)
    cap = scene.flush().capacity
    m0 = np.zeros(cap, bool)
    m1 = np.zeros(cap, bool)
    for inst in instances[:3]:
        m0[inst.index] = True
    for inst in instances[3:]:
        m1[inst.index] = True
    rts, roots, ss, _ = _assemble(
        scene, masks=[jnp.asarray(m0), jnp.asarray(m1)])
    o, d = _rays(seed=12, r=64)
    tris = _world_tris(scene)
    set0 = {i.index for i in instances[:3]}
    tris0 = [t for t in tris if t[0] in set0]
    tris1 = [t for t in tris if t[0] not in set0]
    for root, sub in ((roots[0], tris0), (roots[1], tris1)):
        rec = A.trace_scene(
            rts, jnp.asarray(o), jnp.asarray(d), jnp.full(o.shape[0], 1e9),
            root_code=root, stack_size=ss,
        )
        bt, bp, bi = _brute_force(sub, o, d)
        assert np.array_equal(np.asarray(rec.hit), bp >= 0)
        hit = bp >= 0
        np.testing.assert_allclose(
            np.asarray(rec.t)[hit], bt[hit], rtol=2e-4, atol=2e-4)


def test_unique_geometry_animates_out_of_phase():
    """Two unique-geometry instances of one model deform out of phase
    (reference Model.cpp:398-404 + example main.cpp:908-921)."""
    scene = Scene(use_native=False)
    model = Model.from_mesh(scene.arena, *make_cube(1.0), name="cube")
    scene.register_model(model)
    a = ModelInstance(model, unique_geometry=True)
    b = ModelInstance(model, unique_geometry=True)
    a.anim_phase = 0.0
    b.anim_phase = np.pi
    scene.add_instance(a)
    scene.add_instance(b)
    a.set_transform(pos=(-2.0, 0.0, 0.0))
    b.set_transform(pos=(2.0, 0.0, 0.0))

    def animate(v, t):
        # displace +z by sin(t): at t=pi/2 phase-0 moves up, phase-pi moves down
        return v + jnp.stack(
            [jnp.zeros_like(v[..., 0]), jnp.zeros_like(v[..., 0]),
             jnp.sin(t) * jnp.ones_like(v[..., 0])], axis=-1)

    rts, roots, ss, meta = _assemble(
        scene, time=jnp.float32(np.pi / 2), animate=animate)
    assert len(meta.anim) == 2

    # rays straight down onto each cube's top face
    o = np.array([[-2.0, 0.0, 10.0], [2.0, 0.0, 10.0]], np.float32)
    d = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], np.float32)
    rec = A.trace_scene(
        rts, jnp.asarray(o), jnp.asarray(d), jnp.full(2, 1e9),
        root_code=roots[0], stack_size=ss,
    )
    t = np.asarray(rec.t)
    assert np.all(np.asarray(rec.hit))
    # cube a: top at 0.5 + sin(pi/2) = 1.5 -> t = 8.5
    # cube b: top at 0.5 + sin(3pi/2) = -0.5 -> t = 10.5
    np.testing.assert_allclose(t[0], 8.5, atol=1e-3)
    np.testing.assert_allclose(t[1], 10.5, atol=1e-3)


def test_resolve_attributes():
    """SceneTracer.resolve: hit normal/uv/material from one attr row."""
    from paperrenderer_tpu.core.material import MaterialRegistry

    scene, _, instances = _build_scene(3, seed=21)
    rts, roots, ss, _ = _assemble(scene)
    cap = scene.flush().capacity
    slot_materials = jnp.zeros((cap, 1), jnp.int32)
    table = MaterialRegistry().table()
    tracer = A.SceneTracer(
        rts, slot_materials, table, root_code=roots[0], stack_size=ss)
    o, d = _rays(seed=22, r=64)
    rec = tracer.trace(jnp.asarray(o), jnp.asarray(d), jnp.full(64, 1e9))
    surf = tracer.resolve(rec, jnp.asarray(o), jnp.asarray(d))
    hit = np.asarray(rec.hit)
    n = np.asarray(surf.normal)[hit]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    # normals face the ray
    assert np.all(np.sum(n * d[hit], axis=-1) < 1e-6)
    # world positions lie on the ray at t
    w = np.asarray(surf.world_pos)[hit]
    t = np.asarray(rec.t)[hit]
    np.testing.assert_allclose(
        w, o[hit] + t[:, None] * d[hit], rtol=1e-4, atol=1e-4)


def _node_sa(meta, nodes):
    """Total surface area of the anim BLAS child boxes (quality metric)."""
    rows = np.asarray(nodes)  # [NA, 12]: min0 max0 min1 max1
    sa = 0.0
    for lo_c, hi_c in ((rows[:, 0:3], rows[:, 3:6]),
                       (rows[:, 6:9], rows[:, 9:12])):
        e = np.maximum(hi_c - lo_c, 0.0)
        ok = np.all(np.isfinite(e), axis=-1)
        s = e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 0] * e[:, 2]
        sa += float(np.where(ok, s, 0.0).sum())
    return sa


def test_anim_resplit_matches_refit_hits_and_tightens_boxes():
    """resplit_anim_tables (reference per-frame BLAS rebuild quality,
    main.cpp:908-921): under a large piecewise-rigid-like deformation (the
    character-limb case the per-frame rebuild exists for), (a) traced hits
    are identical to the refit-only tree (the regroup is a pure triangle
    permutation), (b) total node box surface area is materially smaller
    than refit-only, and (c) within a bounded factor of a from-scratch
    host median-split rebuild at the deformed pose."""
    scene = Scene(use_native=False)
    model = Model.from_mesh(scene.arena, *make_plane(4.0, 12), name="sheet")
    scene.register_model(model)
    inst = ModelInstance(model, unique_geometry=True)
    scene.add_instance(inst)
    inst.set_transform(pos=(0.0, 0.0, 0.0))

    def animate(v, t):
        # radius-proportional swirl: rest-adjacent triangles at different
        # radii end far apart, so rest-order leaves fatten (refit), while a
        # regroup at the deformed pose stays tight
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        th = 2.5 * jnp.sqrt(x * x + y * y) + 0.0 * t
        return jnp.stack(
            [x * jnp.cos(th) - y * jnp.sin(th),
             x * jnp.sin(th) + y * jnp.cos(th), z], axis=-1)

    t0 = jnp.float32(0.7)
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    assert len(meta.anim) == 1 and meta.anim[0].num_leaves >= 16

    # (b) box quality: refit-only vs resplit node SA
    nodes_refit, _, _, _ = A.refit_anim_blases(meta, anim_rest, t0, animate)
    rest_p, prim_p, _ = A.resplit_anim_tables(meta, anim_rest, t0, animate)
    nodes_rs, _, _, _ = A.refit_anim_blases(
        meta, rest_p, t0, animate, anim_prim=prim_p)
    sa_refit = _node_sa(meta, nodes_refit)
    sa_rs = _node_sa(meta, nodes_rs)
    assert sa_rs < 0.8 * sa_refit, (sa_rs, sa_refit)

    # (c) bounded vs a from-scratch host rebuild at the deformed pose:
    # reorder triangles with the host _median_order on animated centroids,
    # then build the same implicit-tree boxes
    a = meta.anim[0]
    L = a.num_leaves
    pos = np.asarray(anim_rest[a.leaf_off:a.leaf_off + L,
                               A._POS:A._UV]).reshape(L * A.K, 9)
    va = pos[:, 0:3]
    verts = np.concatenate([va, va + pos[:, 3:6], va + pos[:, 6:9]], axis=-1)
    pos9 = np.asarray(animate(jnp.asarray(verts.reshape(-1, 3)),
                              t0 + a.phase)).reshape(L * A.K, 9)
    pr = np.asarray(a.rest_prim).reshape(L * A.K)
    liv = pr >= 0
    cen = (pos9[:, 0:3] + pos9[:, 3:6] + pos9[:, 6:9]) / 3.0
    order = A._median_order(cen[liv], L * A.K)
    live_ids = np.nonzero(liv)[0]
    # apply the host order to the rest tables and build boxes through the
    # SAME refit path, so the SA accounting is identical to (b)
    hperm = np.full(L * A.K, -1, np.int64)
    for s, idx in enumerate(order):
        hperm[s] = live_ids[idx] if idx >= 0 else -1
    # fill pad slots with the unused (dead) triangle slots
    dead = [i for i in range(L * A.K) if i not in set(hperm[hperm >= 0])]
    di = iter(dead)
    for s in range(L * A.K):
        if hperm[s] < 0:
            hperm[s] = next(di)
    uv = np.asarray(anim_rest[a.leaf_off:a.leaf_off + L,
                              A._UV:]).reshape(L * A.K, 6)
    nrm = np.asarray(meta.anim_leaf_nrm[a.leaf_off:a.leaf_off + L]
                     ).reshape(L * A.K, 9)
    rest_h = jnp.asarray(np.concatenate(
        [pos[hperm].reshape(L, A.K * 9), uv[hperm].reshape(L, A.K * 6)],
        axis=-1))
    prim_h = jnp.asarray(pr[hperm].reshape(L, A.K))
    nodes_h, _, _, _ = A.refit_anim_blases(
        meta, rest_h, t0, animate, anim_prim=prim_h)
    sa_rebuild = _node_sa(meta, nodes_h)
    assert sa_rs <= 1.25 * max(sa_rebuild, 1e-6), (sa_rs, sa_rebuild)

    # (a) hit parity: assemble both ways, trace the same rays
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for a in meta.anim:
        inst_blas[a.instance_index] = a.blas_id
    masks = [jnp.ones(instances.capacity, bool)]
    tri_attr = A.build_tri_attr(scene)
    kw = dict(time=t0, animate=animate)
    rts0, roots0 = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), masks, tri_attr, **kw)
    rts1, roots1 = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), masks, tri_attr, resplit=True, **kw)
    ss = A.required_stack_size(meta, instances.capacity)
    o, d = _rays(seed=3, r=128)
    rec0 = A.trace_scene(rts0, jnp.asarray(o), jnp.asarray(d),
                         jnp.full(o.shape[0], 1e9),
                         root_code=roots0[0], stack_size=ss)
    rec1 = A.trace_scene(rts1, jnp.asarray(o), jnp.asarray(d),
                         jnp.full(o.shape[0], 1e9),
                         root_code=roots1[0], stack_size=ss)
    np.testing.assert_array_equal(np.asarray(rec0.hit), np.asarray(rec1.hit))
    h = np.asarray(rec0.hit)
    np.testing.assert_allclose(np.asarray(rec0.t)[h], np.asarray(rec1.t)[h],
                               rtol=1e-5, atol=1e-5)
    # prim ids are GLOBAL (travel with the permuted leaf rows) — identical
    np.testing.assert_array_equal(np.asarray(rec0.prim)[h],
                                  np.asarray(rec1.prim)[h])
