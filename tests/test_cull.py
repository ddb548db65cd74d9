"""Per-material raster cull mode (VK_CULL_MODE_BACK_BIT parity).

Reference: the default pipeline culls back faces
(src/PaperRenderer/Pipeline.h:80, front face = clockwise :81); the example's
foliage material opts out with CULL_NONE (example/src/main.cpp:543).
"""

import numpy as np

from paperrenderer_tpu.core import (
    Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
    make_cube, make_plane,
)
from paperrenderer_tpu.core.material import CULL_BACK, CULL_NONE
from paperrenderer_tpu.render import RenderPass


def _render_plane_from(z, cull_mode):
    """Render a single-sided ground plane from above (z>0) or below (z<0)."""
    scene = Scene()
    registry = MaterialRegistry()
    plane = Model.from_mesh(scene.arena, *make_plane(size=4.0))
    mat = Material("m", albedo=(0.9, 0.2, 0.1), roughness=0.8,
                   cull_mode=cull_mode)
    rp = RenderPass(scene, registry, width=64, height=64, use_pallas=False)
    rp.add_instance(ModelInstance(plane), {0: mat.instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    up = (0, 1, 0)
    cam.look_at((0.0, 0.0, z), (0.0, 0.0, 0.0), up=up)
    _, aux = rp.render(cam)
    return float(aux["coverage"])


def test_back_face_culled_by_default():
    # default cull mode = BACK: the plane's front side (+z normal) is visible
    # from above, the back side vanishes from below
    assert _render_plane_from(3.0, None) > 0.5
    assert _render_plane_from(-3.0, None) == 0.0


def test_cull_none_renders_double_sided():
    assert _render_plane_from(-3.0, CULL_NONE) > 0.5


def test_explicit_cull_back_matches_default():
    assert _render_plane_from(-3.0, CULL_BACK) == 0.0


def _cube_pass(cull_mode, use_pallas=False, width=128, height=64):
    scene = Scene()
    registry = MaterialRegistry()
    cube = Model.from_mesh(scene.arena, *make_cube(size=1.2))
    mat = Material("m", albedo=(0.2, 0.5, 0.9), roughness=0.4,
                   cull_mode=cull_mode)
    rp = RenderPass(scene, registry, width=width, height=height,
                    use_pallas=use_pallas)
    inst = ModelInstance(cube)
    inst.set_transform(quat=(0.88, 0.2, 0.3, 0.29))
    rp.add_instance(inst, {0: mat.instance()})
    cam = Camera(yfov_deg=55.0, aspect=width / height, near=0.1, far=50.0)
    cam.look_at((0.0, -3.0, 1.5), (0.0, 0.0, 0.0), up=(0, 0, 1))
    return rp, cam


def test_closed_mesh_image_unchanged_by_culling():
    """Back-face culling is invisible on a watertight mesh — the nearest
    covering triangle is always front-facing."""
    rp_a, cam = _cube_pass(CULL_NONE)
    rp_b, _ = _cube_pass(CULL_BACK)
    img_a, _ = rp_a.render(cam)
    img_b, _ = rp_b.render(cam)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=1e-6)


def test_culling_halves_pair_demand_on_closed_mesh(monkeypatch):
    """The perf payoff: a closed mesh's back half leaves the binning stream
    entirely (the reference gets this from fixed-function culling)."""
    from paperrenderer_tpu.core import make_uv_sphere
    from paperrenderer_tpu.render.renderpass import measure_frame_demand

    def demand(cull_mode):
        # dense mesh, big on screen: demand is counted over GROUPs of 8
        # triangles, so the win needs whole back-facing groups (a 12-tri
        # cube's back faces share group AABBs with its silhouette)
        scene = Scene()
        registry = MaterialRegistry()
        sphere = Model.from_mesh(
            scene.arena, *make_uv_sphere(radius=1.0, rings=24, sectors=32))
        mat = Material("m", albedo=(0.2, 0.5, 0.9), cull_mode=cull_mode)
        rp = RenderPass(scene, registry, width=512, height=256,
                        use_pallas=False)
        rp.add_instance(ModelInstance(sphere), {0: mat.instance()})
        cam = Camera(yfov_deg=55.0, aspect=2.0, near=0.1, far=50.0)
        cam.look_at((0.0, -2.6, 0.0), (0.0, 0.0, 0.0), up=(0, 0, 1))
        instances = rp.scene.flush()
        slots, visible, table = rp._device_inputs(instances.capacity)
        mapping = rp._current_mapping()
        return int(measure_frame_demand(
            mapping, instances, rp.scene.tables(), table, cam.matrices,
            slots, visible, width=512, height=256,
        ))

    d_none = demand(CULL_NONE)
    d_back = demand(CULL_BACK)
    assert d_back < d_none
    # a convex closed mesh has ~equal front/back screen area; quarter-round
    # padding keeps the ratio from being exactly 0.5
    assert d_back <= 0.75 * d_none
