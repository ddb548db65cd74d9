"""Unit tests for transform math against independent NumPy references.

Validates the semantics the reference implements in GLSL
(Common.glsl getModelMatrix) and GLM (camera view construction).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.core import transforms as T


def _np_quat_to_mat3(q):
    """Independent reference: standard (w,x,y,z) quaternion to rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def _rand_quat(rng):
    q = rng.normal(size=4)
    return (q / np.linalg.norm(q)).astype(np.float32)


def test_quat_to_mat3_matches_standard_form():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = _rand_quat(rng)
        got = np.asarray(T.quat_to_mat3(jnp.asarray(q)))
        np.testing.assert_allclose(got, _np_quat_to_mat3(q), atol=1e-5)


def test_quat_to_mat3_is_rotation():
    rng = np.random.default_rng(1)
    q = jnp.asarray(np.stack([_rand_quat(rng) for _ in range(8)]))
    R = np.asarray(T.quat_to_mat3(q))
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (8, 3, 3))
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)


def test_quat_multiply_composes_rotations():
    rng = np.random.default_rng(2)
    a, b = _rand_quat(rng), _rand_quat(rng)
    Rab = np.asarray(T.quat_to_mat3(T.quat_multiply(jnp.asarray(a), jnp.asarray(b))))
    np.testing.assert_allclose(Rab, _np_quat_to_mat3(a) @ _np_quat_to_mat3(b), atol=1e-5)


def test_trs_matches_reference_composition():
    """world = R @ S @ v + t — the reference getModelMatrix semantics."""
    rng = np.random.default_rng(3)
    pos = rng.normal(size=3).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=3).astype(np.float32)
    q = _rand_quat(rng)
    v = rng.normal(size=3).astype(np.float32)

    m = T.trs_to_mat34(jnp.asarray(pos), jnp.asarray(scale), jnp.asarray(q))
    got = np.asarray(T.apply_mat34(m, jnp.asarray(v)))
    want = _np_quat_to_mat3(q) @ (scale * v) + pos
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trs_batched():
    rng = np.random.default_rng(4)
    n = 32
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32)
    quat = np.stack([_rand_quat(rng) for _ in range(n)])
    m = T.trs_to_mat34(jnp.asarray(pos), jnp.asarray(scale), jnp.asarray(quat))
    assert m.shape == (n, 3, 4)
    v = rng.normal(size=3).astype(np.float32)
    got = np.asarray(T.apply_mat34(m, jnp.broadcast_to(v, (n, 3))))
    for i in range(n):
        want = _np_quat_to_mat3(quat[i]) @ (scale[i] * v) + pos[i]
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_mat34_inverse_roundtrip():
    rng = np.random.default_rng(5)
    m = T.trs_to_mat34(
        jnp.asarray(rng.normal(size=3), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2, size=3), jnp.float32),
        jnp.asarray(_rand_quat(rng)),
    )
    inv = T.mat34_inverse(m)
    v = jnp.asarray(rng.normal(size=3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(T.apply_mat34(inv, T.apply_mat34(m, v))), np.asarray(v), atol=1e-4
    )


def test_transform_aabb_contains_all_corners():
    rng = np.random.default_rng(6)
    lo = rng.normal(size=3).astype(np.float32) - 1.0
    hi = lo + rng.uniform(0.5, 2.0, size=3).astype(np.float32)
    m = T.trs_to_mat34(
        jnp.asarray(rng.normal(size=3), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2, size=3), jnp.float32),
        jnp.asarray(_rand_quat(rng)),
    )
    new_lo, new_hi = T.transform_aabb(m, jnp.asarray(lo), jnp.asarray(hi))
    corners = np.array(
        [[lo[0], lo[1], lo[2]], [lo[0], lo[1], hi[2]], [lo[0], hi[1], lo[2]],
         [lo[0], hi[1], hi[2]], [hi[0], lo[1], lo[2]], [hi[0], lo[1], hi[2]],
         [hi[0], hi[1], lo[2]], [hi[0], hi[1], hi[2]]],
        np.float32,
    )
    tc = np.asarray(T.apply_mat34(m, jnp.asarray(corners)))
    assert (tc.min(axis=0) >= np.asarray(new_lo) - 1e-4).all()
    assert (tc.max(axis=0) <= np.asarray(new_hi) + 1e-4).all()
