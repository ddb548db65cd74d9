"""BVH tests: build invariants, refit, traversal vs brute-force reference."""

import jax.numpy as jnp
import numpy as np

from paperrenderer_tpu.ops import bvh as B


def _random_tris(rng, n, spread=10.0):
    base = rng.uniform(-spread, spread, size=(n, 1, 3)).astype(np.float32)
    offs = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.8
    return base + offs  # [n, 3, 3]


def _tri_aabbs(tris):
    return tris.min(axis=1), tris.max(axis=1)


def _brute_force(tris, o, d, t_min=1e-3):
    """Reference nearest-hit in float64 numpy."""
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d[None], e2)
    det = np.sum(e1 * p, axis=-1)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0.0)
    s = o[None] - v0
    u = np.sum(s * p, -1) * inv
    q = np.cross(s, e1)
    v = np.sum(d[None] * q, -1) * inv
    t = np.sum(e2 * q, -1) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
    t = np.where(hit, t, np.inf)
    k = int(np.argmin(t))
    return (k, t[k]) if np.isfinite(t[k]) else (-1, np.inf)


def test_build_contains_all_leaves():
    rng = np.random.default_rng(0)
    tris = _random_tris(rng, 37)  # non-power-of-two
    lo, hi = _tri_aabbs(tris)
    bvh = B.build_bvh(jnp.asarray(lo), jnp.asarray(hi), jnp.ones(37, bool),
                      leaf_size=4)
    assert bvh.num_leaves == 16  # ceil(37/4)=10 -> next pow2
    root_lo = np.asarray(bvh.node_min[0])
    root_hi = np.asarray(bvh.node_max[0])
    assert (root_lo <= lo.min(axis=0) + 1e-5).all()
    assert (root_hi >= hi.max(axis=0) - 1e-5).all()
    # perm is a permutation of live prims + -1 padding
    perm = np.asarray(bvh.perm).reshape(-1)
    live = perm[perm >= 0]
    assert sorted(live.tolist()) == list(range(37))
    # every node contains its children
    n_nodes = 2 * 16 - 1
    nm = np.asarray(bvh.node_min)
    nx = np.asarray(bvh.node_max)
    for i in range((n_nodes - 1) // 2):
        for c in (2 * i + 1, 2 * i + 2):
            finite = np.isfinite(nm[c]).all()
            if finite:
                assert (nm[i] <= nm[c] + 1e-6).all()
                assert (nx[i] >= nx[c] - 1e-6).all()


def test_traversal_matches_brute_force():
    rng = np.random.default_rng(1)
    tris = _random_tris(rng, 200)
    lo, hi = _tri_aabbs(tris)
    bvh = B.build_bvh(jnp.asarray(lo), jnp.asarray(hi), jnp.ones(200, bool))
    v0 = jnp.asarray(tris[:, 0])
    v1 = jnp.asarray(tris[:, 1])
    v2 = jnp.asarray(tris[:, 2])

    n_rays = 64
    o = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    rec = B.bvh_trace(
        bvh, v0, v1, v2,
        jnp.asarray(o), jnp.asarray(d), jnp.full((n_rays,), jnp.inf),
    )
    got_prim = np.asarray(rec.prim)
    got_t = np.asarray(rec.t)
    mismatches = 0
    for i in range(n_rays):
        want_prim, want_t = _brute_force(tris.astype(np.float64), o[i], d[i])
        if want_prim != got_prim[i]:
            # accept equal-t ties / f32-vs-f64 boundary flips
            if not (abs(want_t - got_t[i]) < 1e-3 * max(1.0, abs(want_t))):
                mismatches += 1
        elif np.isfinite(want_t):
            assert abs(want_t - got_t[i]) < 1e-3 * max(1.0, want_t)
    assert mismatches == 0


def test_any_hit_occlusion():
    """Shadow-ray semantics: any_hit result agrees with nearest-hit existence."""
    rng = np.random.default_rng(2)
    tris = _random_tris(rng, 100)
    lo, hi = _tri_aabbs(tris)
    bvh = B.build_bvh(jnp.asarray(lo), jnp.asarray(hi), jnp.ones(100, bool))
    v0, v1, v2 = (jnp.asarray(tris[:, k]) for k in range(3))
    n_rays = 32
    o = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    full = B.bvh_trace(bvh, v0, v1, v2, jnp.asarray(o), jnp.asarray(d),
                       jnp.full((n_rays,), jnp.inf))
    any_ = B.bvh_trace(bvh, v0, v1, v2, jnp.asarray(o), jnp.asarray(d),
                       jnp.full((n_rays,), jnp.inf), any_hit=True)
    np.testing.assert_array_equal(np.asarray(full.hit), np.asarray(any_.hit))


def test_t_max_respected():
    tris = np.asarray([[[0, 5, -1], [1, 5, 1], [-1, 5, 1]]], np.float32)
    lo, hi = _tri_aabbs(tris)
    bvh = B.build_bvh(jnp.asarray(lo), jnp.asarray(hi), jnp.ones(1, bool))
    v0, v1, v2 = (jnp.asarray(tris[:, k]) for k in range(3))
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    near = B.bvh_trace(bvh, v0, v1, v2, o, d, jnp.asarray([3.0]))
    far = B.bvh_trace(bvh, v0, v1, v2, o, d, jnp.asarray([10.0]))
    assert not bool(near.hit[0])
    assert bool(far.hit[0])
    assert abs(float(far.t[0]) - 5.0) < 1e-4


def test_refit_tracks_moved_prims():
    rng = np.random.default_rng(3)
    tris = _random_tris(rng, 64)
    lo, hi = _tri_aabbs(tris)
    bvh = B.build_bvh(jnp.asarray(lo), jnp.asarray(hi), jnp.ones(64, bool))
    moved = tris + np.asarray([100.0, 0, 0], np.float32)
    lo2, hi2 = _tri_aabbs(moved)
    bvh2 = B.refit_bvh(bvh, jnp.asarray(lo2), jnp.asarray(hi2))
    # same topology (perm) but root follows the move
    np.testing.assert_array_equal(np.asarray(bvh.perm), np.asarray(bvh2.perm))
    root_lo = np.asarray(bvh2.node_min[0])
    assert root_lo[0] > 50.0
    # traversal still correct after refit
    v0, v1, v2 = (jnp.asarray(moved[:, k]) for k in range(3))
    o = jnp.asarray([[100.0, 0.0, -30.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    rec = B.bvh_trace(bvh2, v0, v1, v2, o, d, jnp.asarray([jnp.inf]))
    want_prim, want_t = _brute_force(moved.astype(np.float64), np.asarray(o[0]), np.asarray(d[0]))
    assert bool(rec.hit[0]) == (want_prim >= 0)


def test_inactive_rays_skipped():
    tris = np.asarray([[[0, 5, -1], [1, 5, 1], [-1, 5, 1]]], np.float32)
    lo, hi = _tri_aabbs(tris)
    bvh = B.build_bvh(jnp.asarray(lo), jnp.asarray(hi), jnp.ones(1, bool))
    v0, v1, v2 = (jnp.asarray(tris[:, k]) for k in range(3))
    o = jnp.zeros((2, 3))
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    rec = B.bvh_trace(bvh, v0, v1, v2, o, d, jnp.full((2,), jnp.inf),
                      active=jnp.asarray([True, False]))
    assert bool(rec.hit[0]) and not bool(rec.hit[1])
