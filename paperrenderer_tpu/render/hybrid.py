"""Hybrid rendering: raster G-buffer + ray-traced lighting composited.

The reference example's two render paths (raster RenderPass vs RayTraceRender,
toggled in the GUI) are combined here the way the BASELINE config 4 demands:
primary visibility from the rasterizer (cheap, exact), then RT passes — soft
shadows, RTAO, 1-bounce reflections — evaluated AT the G-buffer surfaces and
fed into the same deferred shading used by both paths.

This is strictly better than the reference's either/or toggle: identical
shading math guarantees the two paths agree, and the expensive wavefronts
(shadow/AO/reflection) run only for covered pixels.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.camera import Camera, CameraMatrices
from ..core.material import MaterialTable
from ..core.scene import InstanceArrays, SceneTables
from ..core.geometry import GeometryArrays
from ..ops import preprocess as P
from ..ops import raster as R
from ..ops import trace as T
from ..ops.bvh import build_bvh
from ..ops.shading import Lights, shade_gbuffer
from ..ops.tonemap import TonemapParams, tonemap
from ..ops.trace import RTParams
from .renderpass import RenderPass
from .raytrace import RayTraceRender, build_world_scene


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_meshes_per_lod", "tri_capacity",
        "rt_tri_capacity", "do_culling", "use_pallas", "work_capacity",
        "shadow_samples", "reflection_samples", "ao_samples", "ao_radius",
    ),
)
def hybrid_frame(
    mapping,                      # ops.static_batch.StaticMapping
    instances: InstanceArrays,
    tables: SceneTables,
    geo: GeometryArrays,
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    instance_visible: jax.Array,
    tonemap_params: TonemapParams,
    key: jax.Array,
    *,
    width: int,
    height: int,
    max_meshes_per_lod: int,
    tri_capacity: int,
    rt_tri_capacity: int,
    do_culling: bool = True,
    use_pallas: bool = False,
    work_capacity: int = 0,
    shadow_samples: int = 1,
    reflection_samples: int = 1,
    ao_samples: int = 1,
    ao_radius: float = 2.0,
):
    """One hybrid frame. Returns (ldr, aux)."""
    from ..ops.static_batch import expand_static

    # --- raster G-buffer (primary visibility, static expansion) ------------
    batch, inst_visible = expand_static(
        mapping, instances, tables, camera, slot_materials, instance_visible,
        do_culling=do_culling,
    )
    if use_pallas:
        from ..ops.raster_pallas import rasterize_tiles_binned

        depth, tid, bary, _req = rasterize_tiles_binned(
            batch, width, height,
            work_capacity=work_capacity or None, presorted=True,
        )
    else:
        depth, tid, bary = R.rasterize(batch, width, height)
    gbuf = R.resolve_gbuffer_packed(
        R.pack_attributes(batch), depth, tid, bary, camera
    )

    # --- world BVH for the RT passes (full scene, LOD0, no culling) --------
    rt_batch, _ = expand_static(
        mapping, instances, tables, camera, slot_materials,
        do_culling=False, lod_override=0,
    )
    lo = rt_batch.world.min(axis=1)
    hi = rt_batch.world.max(axis=1)
    from ..ops.bvh import build_bvh as _build

    bvh = _build(lo, hi, rt_batch.valid)

    # --- RT passes at G-buffer surfaces ------------------------------------
    surf = T.SurfaceHits(
        world_pos=gbuf.world_pos.reshape(-1, 3),
        normal=gbuf.normal.reshape(-1, 3),
        uv=gbuf.uv.reshape(-1, 2),
        material=gbuf.material.reshape(-1),
        valid=gbuf.coverage.reshape(-1),
        t=jnp.where(gbuf.coverage.reshape(-1), depth.reshape(-1), jnp.inf),
    )
    params = RTParams(
        shadow_samples=shadow_samples,
        reflection_samples=reflection_samples,
        ao_samples=ao_samples,
        ao_radius=ao_radius,
    )
    svis = T.shadow_visibility(
        surf, rt_batch, bvh, lights, key, max(1, shadow_samples)
    )
    ao = T.ambient_occlusion(
        surf, rt_batch, bvh, materials,
        jax.random.fold_in(key, 3), ao_samples, ao_radius,
    )

    hdr = shade_gbuffer(
        gbuf, materials, lights, camera.cam_pos,
        shadow_vis=svis.reshape(-1, height, width),
        ambient_occlusion=ao.reshape(height, width),
        background=T.BACKGROUND_RGB,
    )
    if reflection_samples > 0:
        refl = T.reflections(
            surf, rt_batch, bvh, materials, lights, camera.cam_pos,
            jax.random.fold_in(key, 7), params,
        ).reshape(height, width, 3)
        hdr = hdr + jnp.where(gbuf.coverage[..., None], refl, 0.0)

    ldr = tonemap(hdr, tonemap_params)
    aux = {
        "hdr": hdr,
        "coverage": jnp.mean(gbuf.coverage.astype(jnp.float32)),
        "visible_count": jnp.sum(inst_visible.astype(jnp.int32)),
    }
    return ldr, aux


class HybridRender:
    """Host-side hybrid pass: RenderPass-style instance API + RT settings."""

    def __init__(
        self,
        scene,
        materials,
        *,
        width: int = 512,
        height: int = 512,
        lights: Optional[Lights] = None,
        tonemap_params: Optional[TonemapParams] = None,
        shadow_samples: int = 1,
        reflection_samples: int = 1,
        ao_samples: int = 1,
        ao_radius: float = 2.0,
        seed: int = 0,
        use_pallas: Optional[bool] = None,
    ):
        # reuse RenderPass for instance/material bookkeeping
        self._rp = RenderPass(
            scene, materials, width=width, height=height,
            lights=lights, tonemap_params=tonemap_params, use_pallas=use_pallas,
        )
        self.scene = scene
        self.materials = materials
        self.width = width
        self.height = height
        self.shadow_samples = shadow_samples
        self.reflection_samples = reflection_samples
        self.ao_samples = ao_samples
        self.ao_radius = ao_radius
        self._key = jax.random.PRNGKey(seed)
        self._frame = 0
        self._rt_tri_capacity = 2048

    # instance API delegates
    def add_instance(self, instance, materials=None):
        self._rp.add_instance(instance, materials)

    def remove_instance(self, instance):
        self._rp.remove_instance(instance)

    def set_instance_visibility(self, instance, visible):
        self._rp.set_instance_visibility(instance, visible)

    @property
    def lights(self):
        return self._rp.lights

    def render(self, camera: Camera | CameraMatrices):
        cam = camera.matrices if isinstance(camera, Camera) else camera
        rp = self._rp
        instances = self.scene.flush()
        need = rp._required_tri_capacity()
        if need > rp._tri_capacity:
            rp._tri_capacity = need
        rt_need = sum(
            sum(mm.handle.tri_count for mm in inst.model.lods[0].meshes)
            for inst in self.scene.instances
        )
        rt_need = 1 << max(11, (max(rt_need, 1) - 1).bit_length())
        if rt_need > self._rt_tri_capacity:
            self._rt_tri_capacity = rt_need
        slots, visible, table = rp._device_inputs(instances.capacity)
        mapping = rp._current_mapping()
        self._frame += 1
        return hybrid_frame(
            mapping,
            instances,
            self.scene.tables(),
            self.scene.geometry(),
            table,
            rp.lights,
            cam,
            slots,
            visible,
            rp.tonemap_params,
            jax.random.fold_in(self._key, self._frame),
            width=self.width,
            height=self.height,
            max_meshes_per_lod=self.scene.max_meshes_per_lod,
            tri_capacity=rp._tri_capacity,
            rt_tri_capacity=self._rt_tri_capacity,
            do_culling=rp.do_culling,
            use_pallas=rp.use_pallas,
            work_capacity=rp._work_capacity,
            shadow_samples=self.shadow_samples,
            reflection_samples=self.reflection_samples,
            ao_samples=self.ao_samples,
            ao_radius=self.ao_radius,
        )
