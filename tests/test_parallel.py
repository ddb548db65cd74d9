"""Multi-device tests on the virtual 8-CPU mesh: sharded tile rendering must
match the single-device render exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.core import (
    Camera,
    Material,
    MaterialRegistry,
    Model,
    ModelInstance,
    Scene,
    make_cube,
    make_plane,
)
from paperrenderer_tpu.ops.shading import Lights
from paperrenderer_tpu.ops.tonemap import TonemapParams
from paperrenderer_tpu.ops.trace import RTParams
from paperrenderer_tpu.parallel import make_tile_mesh, sharded_render_frame, sharded_rt_frame
from paperrenderer_tpu.render import RenderPass
from paperrenderer_tpu.render.renderpass import render_frame


def _scene():
    scene = Scene()
    registry = MaterialRegistry()
    ground = Model.from_mesh(scene.arena, *make_plane(size=20.0))
    cube = Model.from_mesh(scene.arena, *make_cube(size=1.0))
    red = Material("red", albedo=(0.9, 0.1, 0.1), roughness=0.5)
    rp = RenderPass(scene, registry, width=64, height=64)
    g = ModelInstance(ground)
    rp.add_instance(g)
    c = ModelInstance(cube)
    c.set_transform(pos=(0.0, 0.0, 0.5))
    rp.add_instance(c, {0: red.instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, -5.0, 3.0), (0.0, 0.0, 0.5), up=(0, 0, 1))
    return scene, registry, rp, cam


def test_mesh_uses_all_devices():
    mesh = make_tile_mesh()
    assert mesh.devices.size == len(jax.devices())


def test_sharded_raster_matches_single_device():
    scene, registry, rp, cam = _scene()
    mesh = make_tile_mesh()
    arrays = scene.flush()
    args = (
        arrays, scene.tables(), scene.geometry(), registry.table(),
        rp.lights, cam.matrices,
        rp._slot_material_array(arrays.capacity),
        rp._visible_array(arrays.capacity),
        rp.tonemap_params,
    )
    kw = dict(width=64, height=64, max_meshes_per_lod=1, tri_capacity=256)
    single, _aux = render_frame(*args, **kw)
    sharded = sharded_render_frame(mesh, *args, **kw)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_sharded_two_level_rt_matches_single_device():
    """The round-2 two-level BLAS/TLAS + SceneTracer path under shard_map
    (make_sharded_rt_frame) == the single-device make_rt_frame, exactly.

    Deterministic config (radius-0 light, no reflections/AO) so the per-tile
    RNG fold cannot introduce sampling differences."""
    import numpy as _np

    from paperrenderer_tpu.ops import accel as A
    from paperrenderer_tpu.parallel import make_sharded_rt_frame
    from paperrenderer_tpu.render.raytrace import AccelCache, make_rt_frame

    scene, registry, rp, cam = _scene()
    rp.lights = Lights.make(
        [{"position": (3.0, -4.0, 5.0), "color": (40.0, 40.0, 40.0),
          "bounds": 100.0, "radius": 0.0}])
    mesh = make_tile_mesh()
    arrays = scene.flush()
    accel = AccelCache(scene)
    blasset, meta, anim_rest, anim_nodes = accel.blas()
    inst_blas = accel.inst_blas(arrays.capacity)
    tri_attr = accel.tri_attr()
    masks = (jnp.ones(arrays.capacity, bool),)
    slots = rp._slot_material_array(arrays.capacity)
    table = rp.materials.table()
    kw = dict(
        width=64, height=32,
        stack_size=accel.stack_size(arrays.capacity),
        shadow_samples=1, reflection_samples=0, ao_samples=0,
        ao_radius=2.0, leaf_cutout=False,
    )
    args = (blasset, anim_rest, anim_nodes, arrays, inst_blas, masks,
            tri_attr, table, rp.lights, cam.matrices, slots,
            rp.tonemap_params, jax.random.PRNGKey(7), jnp.float32(0.0))

    single_fn = make_rt_frame(meta, None, 1, use_pallas=False)
    single, _ = single_fn(*args, **kw)
    sharded_fn = make_sharded_rt_frame(mesh, meta, None, use_pallas=False)
    sharded = sharded_fn(*args, **kw)
    _np.testing.assert_allclose(
        _np.asarray(sharded), _np.asarray(single), atol=1e-5)
    assert _np.asarray(single).std() > 0.01


def test_sharded_rt_runs_and_covers():
    scene, registry, rp, cam = _scene()
    mesh = make_tile_mesh()
    arrays = scene.flush()
    img = sharded_rt_frame(
        mesh,
        arrays, scene.tables(), scene.geometry(), registry.table(),
        rp.lights, cam.matrices,
        rp._slot_material_array(arrays.capacity),
        rp.tonemap_params,
        jax.random.PRNGKey(0),
        width=32, height=32, max_meshes_per_lod=1, tri_capacity=256,
        params=RTParams(shadow_samples=1, reflection_samples=0, ao_samples=0),
    )
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.std() > 0.01


def test_sharded_paged_rt_matches_single_device():
    """make_sharded_rt_frame(paged=True) — the chunked-TLAS path under
    shard_map — == the single-device NON-paged make_rt_frame (the paged
    structure is a different layout of the same scene, so this also pins
    paged == resident through the sharding seams). Round-3 VERDICT weak #4:
    this configuration was previously untested."""
    import numpy as _np

    from paperrenderer_tpu.parallel import make_sharded_rt_frame
    from paperrenderer_tpu.render.raytrace import AccelCache, make_rt_frame

    scene, registry, rp, cam = _scene()
    rp.lights = Lights.make(
        [{"position": (3.0, -4.0, 5.0), "color": (40.0, 40.0, 40.0),
          "bounds": 100.0, "radius": 0.0}])
    mesh = make_tile_mesh()
    arrays = scene.flush()
    accel = AccelCache(scene)
    blasset, meta, anim_rest, anim_nodes = accel.blas()
    inst_blas = accel.inst_blas(arrays.capacity)
    tri_attr = accel.tri_attr()
    masks = (jnp.ones(arrays.capacity, bool),)
    slots = rp._slot_material_array(arrays.capacity)
    table = rp.materials.table()
    kw = dict(
        width=64, height=32,
        stack_size=accel.stack_size(arrays.capacity),
        shadow_samples=1, reflection_samples=0, ao_samples=0,
        ao_radius=2.0, leaf_cutout=False,
    )
    args = (blasset, anim_rest, anim_nodes, arrays, inst_blas, masks,
            tri_attr, table, rp.lights, cam.matrices, slots,
            rp.tonemap_params, jax.random.PRNGKey(7), jnp.float32(0.0))

    single_fn = make_rt_frame(meta, None, 1, use_pallas=False)
    single, _ = single_fn(*args, **kw)
    sharded_fn = make_sharded_rt_frame(
        mesh, meta, None, use_pallas=False, paged=True)
    sharded = sharded_fn(*args, **kw)
    _np.testing.assert_allclose(
        _np.asarray(sharded), _np.asarray(single), atol=1e-5)
    assert _np.asarray(single).std() > 0.01
