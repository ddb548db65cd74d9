"""Camera tests: projection/view construction and basic invariants."""

import jax.numpy as jnp
import numpy as np

from paperrenderer_tpu.core import camera as C


def test_perspective_matches_glm():
    """Spot-check against glm::perspective (RH, depth [-1,1])."""
    yfov, aspect, near, far = 75.0, 16 / 9, 0.1, 100.0
    m = np.asarray(C.perspective(yfov, aspect, near, far))
    f = 1.0 / np.tan(np.deg2rad(yfov) / 2)
    np.testing.assert_allclose(m[0, 0], f / aspect, rtol=1e-5)
    np.testing.assert_allclose(m[1, 1], f, rtol=1e-5)
    np.testing.assert_allclose(m[2, 2], (far + near) / (near - far), rtol=1e-5)
    np.testing.assert_allclose(m[2, 3], 2 * far * near / (near - far), rtol=1e-5)
    assert m[3, 2] == -1.0 and m[3, 3] == 0.0


def test_perspective_depth_range():
    m = np.asarray(C.perspective(60.0, 1.0, 0.5, 50.0))

    def project_z(z):
        v = m @ np.array([0, 0, z, 1.0])
        return v[2] / v[3]

    np.testing.assert_allclose(project_z(-0.5), -1.0, atol=1e-5)  # near
    np.testing.assert_allclose(project_z(-50.0), 1.0, atol=1e-5)  # far


def test_look_at_centers_target():
    view = C.look_at((5.0, 4.0, 3.0), (0.0, 0.0, 0.0))
    v = np.asarray(view) @ np.array([0, 0, 0, 1.0])
    # target straight ahead: x=y=0, z negative (RH camera looks down -Z)
    np.testing.assert_allclose(v[:2], 0.0, atol=1e-5)
    assert v[2] < 0


def test_view_from_pos_quat_identity():
    view = np.asarray(
        C.view_from_pos_quat(jnp.asarray([1.0, 2.0, 3.0]), jnp.asarray([1.0, 0, 0, 0]))
    )
    np.testing.assert_allclose(view[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(view[:3, 3], [-1, -2, -3], atol=1e-6)


def test_cam_pos_recovered_from_view():
    eye = (7.0, -3.0, 2.5)
    cam = C.Camera(aspect=1.0)
    cam.look_at(eye, (0, 0, 0))
    np.testing.assert_allclose(np.asarray(cam.matrices.cam_pos), eye, atol=1e-4)


def test_orthographic_maps_extents():
    m = np.asarray(C.orthographic(2.0, 4.0, 0.1, 10.0))
    v = m @ np.array([2.0, 4.0, -10.0, 1.0])
    np.testing.assert_allclose(v[:3] / v[3], [1.0, 1.0, 1.0], atol=1e-5)
