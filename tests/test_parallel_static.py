"""Triangle-sharded (dp) + screen-tile (sp) static path must match the
single-device static renderer exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from paperrenderer_tpu.core import (
    Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
    make_cube, make_plane,
)
from paperrenderer_tpu.ops.static_batch import build_static_mapping
from paperrenderer_tpu.parallel import make_tile_mesh, sharded_render_frame_static
from paperrenderer_tpu.render import RenderPass
from paperrenderer_tpu.render.renderpass import render_frame_static


def test_triangle_sharded_matches_single_device():
    scene = Scene()
    registry = MaterialRegistry()
    ground = Model.from_mesh(scene.arena, *make_plane(size=20.0))
    cube = Model.from_mesh(scene.arena, *make_cube(size=1.0))
    red = Material("red", albedo=(0.9, 0.1, 0.1), roughness=0.5)
    rp = RenderPass(scene, registry, width=64, height=64)
    rp.add_instance(ModelInstance(ground))
    c = ModelInstance(cube)
    c.set_transform(pos=(0.0, 0.0, 0.5))
    rp.add_instance(c, {0: red.instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, -5.0, 3.0), (0.0, 0.0, 0.5), up=(0, 0, 1))

    mesh = make_tile_mesh()
    arrays = scene.flush()
    slots, visible, table = rp._device_inputs(arrays.capacity)
    mapping = build_static_mapping(scene)
    tables = scene.tables()

    single, _ = render_frame_static(
        mapping, arrays, tables, table, rp.lights, cam.matrices,
        slots, visible, rp.tonemap_params,
        width=64, height=64, use_pallas=False,
    )
    sharded = sharded_render_frame_static(
        mesh, mapping, arrays, tables, table, rp.lights, cam.matrices,
        slots, visible, rp.tonemap_params,
        width=64, height=64,
    )
    # fusion differences across the shard boundary give last-bit deltas
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-4
    )
