"""Per-instance RT visibility masks + force-opaque flags.

Reference: ``AccelerationStructureInstanceData{customIndex:24, mask:8,
flags}`` (src/PaperRenderer/RayTrace.h:19-35) with the per-trace cullMask of
``traceRayEXT`` (example raytrace.rgen:33); the example sets mask=0xFF and
FACING_CULL_DISABLE flags (main.cpp:611-612).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.core import (
    Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
    make_cube, make_plane,
)
from paperrenderer_tpu.ops import accel as A
from paperrenderer_tpu.ops.trace import raygen, shadow_visibility
from paperrenderer_tpu.ops.shading import Lights


SHADOW_ONLY = 0x02   # example mask class: geometry visible to shadow rays


def _scene(mask_for_cube=0xFF, force_opaque=False):
    from paperrenderer_tpu.render.raytrace import RayTraceRender

    scene = Scene()
    registry = MaterialRegistry()
    ground = Model.from_mesh(scene.arena, *make_plane(size=12.0))
    cube = Model.from_mesh(scene.arena, *make_cube(size=1.2))
    rt = RayTraceRender(
        scene, registry, width=32, height=32,
        lights=Lights.make([{"position": (0.0, 0.0, 8.0),
                             "color": (60.0, 60.0, 60.0), "bounds": 50.0}]),
        shadow_samples=1, reflection_samples=0, ao_samples=0,
        use_pallas=False,
    )
    white = Material("white", albedo=(0.8, 0.8, 0.8), roughness=0.9)
    red = Material("red", albedo=(0.9, 0.1, 0.1), roughness=0.4)
    g = ModelInstance(ground)
    rt.add_instance(g, {0: white.instance()})
    c = ModelInstance(cube)
    # hovering cube between the light and the ground: casts a shadow
    c.set_transform(pos=(0.0, 0.0, 2.0))
    rt.add_instance(c, {0: red.instance()}, mask=mask_for_cube,
                    force_opaque=force_opaque)
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, -7.0, 5.0), (0.0, 0.0, 0.5), up=(0, 0, 1))
    return rt, cam


def _tracer(rt, leaf_cutout=False):
    instances = rt.scene.flush()
    blasset, meta, anim_rest, anim_nodes = rt.accel.blas()
    slots, masks, table = rt._device_inputs(instances.capacity)
    inst_mask, inst_opaque = rt._cached_inst_mask
    return A.make_scene_tracer(
        blasset, meta, anim_rest, anim_nodes, instances,
        rt.accel.inst_blas(instances.capacity), masks,
        rt.accel.tri_attr(), slots, table,
        tlas_index=0,
        stack_size=rt.accel.stack_size(instances.capacity),
        use_pallas=False, leaf_cutout=leaf_cutout,
        inst_mask=inst_mask, inst_opaque=inst_opaque,
    ), table


def test_mask_hides_instance_from_matching_rays():
    """cube mask=SHADOW_ONLY: camera rays (cull 0xFD) miss it, shadow rays
    (cull 0x02) still see it — the classic shadow-proxy setup."""
    rt, cam = _scene(mask_for_cube=SHADOW_ONLY)
    ctx, table = _tracer(rt)
    o, d = raygen(cam.matrices, 32, 32)
    r = o.shape[0]
    tmax = jnp.full((r,), 100.0)

    # default cull mask: every instance visible
    surf_all = ctx.trace_resolve(o, d, tmax)
    # camera-ray cull mask excluding the shadow-only class
    surf_cam = ctx.trace_resolve(o, d, tmax, cull_mask=0xFF & ~SHADOW_ONLY)
    hits_all = np.asarray(surf_all.valid)
    hits_cam = np.asarray(surf_cam.valid)
    # the cube occupies some pixels in the full trace...
    inst_all = np.asarray(ctx.trace(o, d, tmax).inst)
    assert (inst_all == 1).any(), "cube must be visible at mask 0xFF"
    # ...and none when camera rays cull its mask class
    inst_cam = np.asarray(ctx.trace(o, d, tmax,
                                    cull_mask=0xFF & ~SHADOW_ONLY).inst)
    assert not (inst_cam == 1).any()
    # rays that hit the cube before now pass through to the ground
    assert hits_cam.sum() >= hits_all.sum() * 0.9

    # shadow rays WITH the matching cull mask still get occluded by the cube
    lights = rt.lights
    svis_match = shadow_visibility(surf_cam, ctx, lights,
                                   jax.random.PRNGKey(0), 1,
                                   cull_mask=SHADOW_ONLY)
    svis_skip = shadow_visibility(surf_cam, ctx, lights,
                                  jax.random.PRNGKey(0), 1,
                                  cull_mask=0xFF & ~SHADOW_ONLY)
    vm = np.asarray(svis_match[0])
    vs = np.asarray(svis_skip[0])
    valid = np.asarray(surf_cam.valid)
    # matching mask: some ground points are shadowed by the cube
    assert (vm[valid] < 0.5).any()
    # skipping mask: the cube casts nothing — fully visible
    assert (vs[valid] > 0.5).all()


def test_mask_zero_hides_from_everything():
    rt, cam = _scene(mask_for_cube=0x00)
    ctx, _ = _tracer(rt)
    o, d = raygen(cam.matrices, 32, 32)
    tmax = jnp.full((o.shape[0],), 100.0)
    inst = np.asarray(ctx.trace(o, d, tmax).inst)
    assert not (inst == 1).any()


def test_force_opaque_skips_leaf_cutout():
    """A leaf-material instance with force_opaque hits everywhere its
    geometry covers (the any-hit cutout is skipped —
    VK_GEOMETRY_INSTANCE_FORCE_OPAQUE parity)."""
    from paperrenderer_tpu.core.material import SHADE_LEAF
    from paperrenderer_tpu.render.raytrace import RayTraceRender

    def hits(force):
        scene = Scene()
        registry = MaterialRegistry()
        plane = Model.from_mesh(scene.arena, *make_plane(size=4.0))
        rt = RayTraceRender(scene, registry, width=32, height=32,
                            use_pallas=False)
        leaf = Material("leaf", albedo=(0.2, 0.7, 0.2),
                        shading_model=SHADE_LEAF)
        p = ModelInstance(plane)
        rt.add_instance(p, {0: leaf.instance()}, force_opaque=force)
        cam = Camera(yfov_deg=50.0, aspect=1.0, near=0.1, far=50.0)
        cam.look_at((0.0, 0.0, 6.0), (0.0, 0.0, 0.0), up=(0, 1, 0))
        ctx, _ = _tracer(rt, leaf_cutout=True)
        o, d = raygen(cam.matrices, 32, 32)
        tmax = jnp.full((o.shape[0],), 100.0)
        surf = ctx.trace_resolve(o, d, tmax, use_alpha=True)
        return np.asarray(surf.valid).sum()

    h_cut = hits(False)
    h_opq = hits(True)
    # the procedural leaf pattern cuts out part of the quad; force-opaque
    # restores full coverage
    assert h_opq > h_cut
    assert h_cut > 0


def test_masks_default_to_visible_everywhere():
    """No masks set: behavior identical to pre-mask traces (record packing
    must not change ids or hits)."""
    rt, cam = _scene()
    ctx, _ = _tracer(rt)
    o, d = raygen(cam.matrices, 32, 32)
    tmax = jnp.full((o.shape[0],), 100.0)
    rec = ctx.trace(o, d, tmax)
    inst = np.asarray(rec.inst)
    assert set(np.unique(inst)) <= {-1, 0, 1}
    assert (inst == 0).any() and (inst == 1).any()
