"""Camera: projection + view matrices and the frustum data the culler needs.

Re-implements the reference camera semantics (src/PaperRenderer/Camera.cpp:80-174)
on top of pure-JAX matrix builders:
  * perspective: GLM-compatible right-handed, depth in [-1, 1]
    (glm::perspective — Camera.cpp:100)
  * orthographic: glm::ortho style (Camera.cpp:104)
  * view from position + quaternion, or Z-up yaw/pitch Euler angles
    (Camera.cpp:109-147): ``view = R(q) @ T(-pos)``

The camera state is a small pytree (``CameraMatrices``) so a whole frame —
preprocess, raster, trace — can take it as a jit argument. The reference's
double-buffered UBO (Camera.cpp:149-174) is unnecessary here: the matrices are
just values threaded through the jitted frame function.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .transforms import quat_from_axis_angle, quat_multiply, quat_normalize, quat_to_mat3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraMatrices:
    """Device-side camera state consumed by render kernels.

    Mirrors the reference's ``CameraUBOData{projection, view}`` (Camera.h:56-60)
    plus derived quantities every kernel re-derived per-thread in GLSL
    (view inverse for camera position — IndirectDrawBuild.comp:117-118).
    """

    projection: jax.Array  # f32[4,4]
    view: jax.Array        # f32[4,4]

    @property
    def view_proj(self) -> jax.Array:
        return self.projection @ self.view

    @property
    def cam_pos(self) -> jax.Array:
        """World-space camera position = inverse(view)[:3, 3]."""
        rot = self.view[:3, :3]
        return -rot.T @ self.view[:3, 3]


def perspective(yfov_deg: float, aspect: float, near: float, far: float) -> jax.Array:
    """GLM-compatible right-handed perspective, NDC depth [-1, 1].

    Matches glm::perspective used at Camera.cpp:100.
    """
    f = 1.0 / jnp.tan(jnp.deg2rad(jnp.asarray(yfov_deg, jnp.float32)) * 0.5)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set((far + near) / (near - far))
    m = m.at[2, 3].set(2.0 * far * near / (near - far))
    m = m.at[3, 2].set(-1.0)
    return m


def orthographic(x_scale: float, y_scale: float, near: float, far: float) -> jax.Array:
    """glm::ortho(-x, x, -y, y, near, far) — Camera.cpp:104."""
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(1.0 / x_scale)
    m = m.at[1, 1].set(1.0 / y_scale)
    m = m.at[2, 2].set(-2.0 / (far - near))
    m = m.at[2, 3].set(-(far + near) / (far - near))
    m = m.at[3, 3].set(1.0)
    return m


def view_from_pos_quat(pos: jax.Array, quat: jax.Array) -> jax.Array:
    """``view = mat4(R(q)) @ translate(-pos)`` — Camera.cpp:139-146."""
    rot = quat_to_mat3(quat_normalize(jnp.asarray(quat, jnp.float32)))
    pos = jnp.asarray(pos, jnp.float32)
    view = jnp.eye(4, dtype=jnp.float32)
    view = view.at[:3, :3].set(rot)
    view = view.at[:3, 3].set(rot @ (-pos))
    return view


def quat_from_yaw_pitch(yaw_deg, pitch_deg) -> jax.Array:
    """Z-up Euler -> view quaternion, matching the reference's convention
    (Camera.cpp:124-135): yaw about -Z, pitch about -X (pitch 0 looks along +Y
    horizon after the built-in -90° correction is applied by the caller's
    zUpPitchRot path).
    """
    yaw = jnp.deg2rad(jnp.asarray(yaw_deg, jnp.float32))
    pitch = jnp.deg2rad(jnp.asarray(pitch_deg, jnp.float32))
    yaw_rot = quat_from_axis_angle(jnp.asarray([0.0, 0.0, -1.0]), yaw)
    pitch_rot = quat_from_axis_angle(jnp.asarray([-1.0, 0.0, 0.0]), pitch)
    return quat_normalize(quat_multiply(pitch_rot, yaw_rot))


def look_at(eye, center, up=(0.0, 0.0, 1.0)) -> jax.Array:
    """Right-handed look-at view matrix (Z-up default, like the example app)."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = center - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(right, fwd)
    rot = jnp.stack([right, true_up, -fwd])  # rows
    view = jnp.eye(4, dtype=jnp.float32)
    view = view.at[:3, :3].set(rot)
    view = view.at[:3, 3].set(rot @ (-eye))
    return view


class Camera:
    """Host-side camera object mirroring the reference API (Camera.h:56-88).

    Holds the current projection/view; ``matrices`` returns the immutable
    pytree passed into jitted render functions.
    """

    def __init__(
        self,
        *,
        yfov_deg: Optional[float] = 75.0,
        ortho_scale: Optional[tuple] = None,
        aspect: float = 1.0,
        near: float = 0.1,
        far: float = 1000.0,
    ):
        self._aspect = float(aspect)
        self._near = float(near)
        self._far = float(far)
        self._yfov = yfov_deg
        self._ortho = ortho_scale
        self._view = jnp.eye(4, dtype=jnp.float32)
        self._rebuild_projection()

    def _rebuild_projection(self) -> None:
        if self._ortho is not None:
            self._projection = orthographic(
                self._ortho[0], self._ortho[1], self._near, self._far
            )
        else:
            self._projection = perspective(
                self._yfov, self._aspect, self._near, self._far
            )

    # -- reference-parity API (Camera.h:66-83) ------------------------------
    def set_aspect(self, aspect: float) -> None:
        self._aspect = float(aspect)
        self._rebuild_projection()

    def update_projection(self, *, yfov_deg=None, ortho_scale=None, near=None, far=None):
        if yfov_deg is not None:
            self._yfov, self._ortho = yfov_deg, None
        if ortho_scale is not None:
            self._ortho = ortho_scale
        if near is not None:
            self._near = float(near)
        if far is not None:
            self._far = float(far)
        self._rebuild_projection()

    def update_view(self, *, pos=None, quat=None, yaw_pitch=None, matrix=None):
        if matrix is not None:
            self._view = jnp.asarray(matrix, jnp.float32)
            return
        if yaw_pitch is not None:
            quat = quat_from_yaw_pitch(*yaw_pitch)
        self._view = view_from_pos_quat(jnp.asarray(pos, jnp.float32), quat)

    def look_at(self, eye, center, up=(0.0, 0.0, 1.0)) -> None:
        self._view = look_at(eye, center, up)

    @property
    def matrices(self) -> CameraMatrices:
        return CameraMatrices(projection=self._projection, view=self._view)
