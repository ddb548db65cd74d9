"""Transform math: quaternions, TRS composition, 3x4 model matrices.

TPU-native re-design of the reference's GLSL transform helpers
(reference: resources/shaders/Common.glsl:79-117 ``getModelMatrix``).
Everything here is vectorized over arbitrary leading batch dimensions so a
single call computes matrices for the whole instance SoA buffer at once —
the per-thread GLSL loop becomes one fused VPU pass under jit.

Conventions (matching the reference):
  * Quaternions are (w, x, y, z), normalized.
  * A model matrix is a row-major ``f32[..., 3, 4]``: ``world = M[:, :3] @ v + M[:, 3]``
    with ``M[:, :3] = R @ diag(scale)`` — i.e. scale, then rotate, then translate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) ``[..., 4]``."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat3(q: jax.Array) -> jax.Array:
    """Quaternion(s) (w,x,y,z) ``[..., 4]`` -> rotation matrix ``[..., 3, 3]``.

    Row-major: ``world = R @ v``. Matches the reference's quaternion->matrix
    math (Common.glsl:82-99) which builds the transpose as GLSL columns.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 2.0 * (w * w + x * x) - 1.0
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 2.0 * (w * w + y * y) - 1.0
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 2.0 * (w * w + z * z) - 1.0
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b of (w,x,y,z) quaternions ``[..., 4]``."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis-angle -> quaternion (w,x,y,z). ``axis [..., 3]`` need not be unit."""
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def trs_to_mat34(pos: jax.Array, scale: jax.Array, quat: jax.Array) -> jax.Array:
    """Per-instance TRS -> 3x4 model matrices, ``[..., 3]/[..., 3]/[..., 4] -> [..., 3, 4]``.

    TPU-native replacement for the per-thread ``getModelMatrix``
    (Common.glsl:79-117): one vectorized pass over the instance SoA buffer.
    """
    rot = quat_to_mat3(quat)                      # [..., 3, 3]
    rs = rot * scale[..., None, :]                # R @ diag(scale)
    return jnp.concatenate([rs, pos[..., :, None]], axis=-1)


def apply_mat34(m: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply 3x4 matrices to points. ``m [..., 3, 4]``, ``pts [..., 3]`` -> ``[..., 3]``."""
    return jnp.einsum("...ij,...j->...i", m[..., :, :3], pts) + m[..., :, 3]


def mat34_inverse(m: jax.Array) -> jax.Array:
    """Inverse of an affine 3x4 matrix (for world->object ray transforms)."""
    a = m[..., :, :3]
    t = m[..., :, 3]
    a_inv = jnp.linalg.inv(a)
    t_inv = -jnp.einsum("...ij,...j->...i", a_inv, t)
    return jnp.concatenate([a_inv, t_inv[..., :, None]], axis=-1)


def mat34_to_mat44(m: jax.Array) -> jax.Array:
    """Promote ``[..., 3, 4]`` to a full homogeneous ``[..., 4, 4]``."""
    last = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=m.dtype),
        m.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([m, last], axis=-2)


def transform_aabb(m: jax.Array, aabb_min: jax.Array, aabb_max: jax.Array):
    """Transform AABBs by 3x4 matrices; returns the AABB of the 8 transformed
    corners (the same corner-expansion the reference cull shader does,
    Common.glsl:123-152). ``m [..., 3, 4]``, aabbs ``[..., 3]``.
    """
    a = m[..., :, :3]
    t = m[..., :, 3]
    # Arvo's method: center/extent form avoids materializing 8 corners.
    center = (aabb_min + aabb_max) * 0.5
    extent = (aabb_max - aabb_min) * 0.5
    new_center = jnp.einsum("...ij,...j->...i", a, center) + t
    new_extent = jnp.einsum("...ij,...j->...i", jnp.abs(a), extent)
    return new_center - new_extent, new_center + new_extent
