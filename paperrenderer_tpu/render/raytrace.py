"""RayTraceRender: the ray-traced render path.

Reference parity: ``RayTraceRender`` (src/PaperRenderer/RayTrace.h:37-99)
owns an RT pipeline + one or more TLASes and dispatches
``vkCmdTraceRaysKHR``. Here (round-2 two-level redesign):

  * **BLAS** per model, built once at first use over LOD-0 object-space
    triangles (Model.cpp:59-74) and cached host-side (ops/accel.py).
  * **TLAS** per frame per pass: instance world AABBs -> morton BVH. This is
    the ``TLAS::updateTLAS`` analogue (AccelerationStructure.cpp:618-650):
    O(N) instance math + one sort, NO vertex re-transforms.
  * **Multiple TLASes** (RayTrace.h:50-56, addNewTLAS RayTrace.cpp:159-170):
    ``add_tlas()`` creates another instance set; all TLASes share the BLAS
    rows and are appended as extra node-row blocks with their own roots.
  * **Unique-geometry animation** (Model.cpp:398-404): instances created
    with ``unique_geometry=True`` get their own BLAS whose leaf/node rows are
    refit in-graph each frame from ``animate(v, time + phase)``.
  * The SBT hit-group dispatch becomes the material-id switch inside the
    shade kernels (ops/trace.py); hit-group changes are table-row updates,
    never a pipeline rebuild.

The legacy single-level path (per-frame world BVH over all transformed
triangles) is kept as ``build_world_scene``/``rt_frame`` — it is the
brute-force reference the two-level path is validated against, and the
sharded-tiles path still uses it.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera, CameraMatrices
from ..core.geometry import GeometryArrays
from ..core.material import MaterialInstance, MaterialRegistry, MaterialTable
from ..core.model import ModelInstance
from ..core.scene import InstanceArrays, Scene, SceneTables
from ..ops import accel as ACC
from ..ops import preprocess as P
from ..ops import raster as R
from ..ops.bvh import BVH, build_bvh
from ..ops.shading import Lights
from ..ops.tonemap import TonemapParams, tonemap
from ..ops.trace import BatchTracer, RTParams, trace_frame


# ---------------------------------------------------------------------------
# Legacy single-level world BVH (round-1 path; reference/fallback)
# ---------------------------------------------------------------------------

def build_world_scene(
    instances: InstanceArrays,
    tables: SceneTables,
    geo: GeometryArrays,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    *,
    max_meshes_per_lod: int,
    tri_capacity: int,
):
    """All live instances' LOD-0 triangles in world space + a BVH over them.

    Round-1 design: rebuild-per-frame world BVH. Kept as the validation
    reference for the two-level path and for sharded tiles."""
    pre = P.preprocess_instances(
        instances, tables, camera,
        max_meshes_per_lod=max_meshes_per_lod,
        do_culling=False,
        slot_materials=slot_materials,
        lod_override=0,
    )
    batch = R.build_triangle_batch(pre, geo, camera, capacity=tri_capacity)
    lo = batch.world.min(axis=1)
    hi = batch.world.max(axis=1)
    bvh = build_bvh(lo, hi, batch.valid)
    return batch, bvh


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_meshes_per_lod", "tri_capacity",
        "shadow_samples", "reflection_samples", "ao_samples", "ao_radius",
        "leaf_cutout",
    ),
)
def rt_frame(
    instances: InstanceArrays,
    tables: SceneTables,
    geo: GeometryArrays,
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    tonemap_params: TonemapParams,
    key: jax.Array,
    textures=None,
    *,
    width: int,
    height: int,
    max_meshes_per_lod: int,
    tri_capacity: int,
    shadow_samples: int,
    reflection_samples: int,
    ao_samples: int,
    ao_radius: float,
    leaf_cutout: bool = False,
):
    """Legacy full ray-traced frame: world BVH build + wavefront trace."""
    batch, bvh = build_world_scene(
        instances, tables, geo, camera, slot_materials,
        max_meshes_per_lod=max_meshes_per_lod, tri_capacity=tri_capacity,
    )
    params = RTParams(
        shadow_samples=shadow_samples,
        reflection_samples=reflection_samples,
        ao_samples=ao_samples,
        ao_radius=ao_radius,
        leaf_cutout=leaf_cutout,
    )
    ctx = BatchTracer(batch, bvh, materials, leaf_cutout=leaf_cutout,
                      textures=textures)
    hdr = trace_frame(
        ctx, materials, lights, camera, key,
        width=width, height=height, params=params,
    )
    ldr = tonemap(hdr, tonemap_params)
    return ldr, {"hdr": hdr, "total_tris": jnp.sum(batch.valid.astype(jnp.int32))}


# ---------------------------------------------------------------------------
# Two-level acceleration cache (host-side; shared by RT + hybrid passes)
# ---------------------------------------------------------------------------

class AccelCache:
    """Host-side cache of the scene's BLAS set + per-topology device inputs.

    The AccelerationStructureBuilder analogue: BLAS builds are queued by
    topology changes and amortized (the reference queues at Model creation,
    Model.cpp:59-74); TLAS inputs (inst_blas, tri_attr) rebuild on instance
    add/remove (scene.version), matching verifyInstancesBuffer semantics."""

    def __init__(self, scene: Scene):
        self.scene = scene
        self._blas_key = None
        self._blas = None
        self._inst_key = None
        self._inst_blas = None
        self._attr_key = None
        self._tri_attr = None

    def _blas_signature(self):
        s = self.scene
        uniq = tuple(
            i.index for i in s.instances if i.unique_geometry
        )
        return (len(s.models), s.arena.revision, uniq)

    def blas(self):
        k = self._blas_signature()
        if k != self._blas_key:
            self._blas = ACC.build_blas_set(self.scene)
            self._blas_key = k
        return self._blas

    def inst_blas(self, capacity: int) -> jax.Array:
        k = (self.scene.version, capacity, self._blas_signature())
        if k != self._inst_key:
            _, meta, _, _ = self.blas()
            arr = np.zeros(capacity, np.int32)
            for inst in self.scene.instances:
                arr[inst.index] = meta.blas_of_model[inst.model.model_id]
            for a in meta.anim:
                if 0 <= a.instance_index < capacity:
                    arr[a.instance_index] = a.blas_id
            self._inst_blas = jnp.asarray(arr)
            self._inst_key = k
        return self._inst_blas

    def tri_attr(self) -> jax.Array:
        k = (self.scene.arena.revision, len(self.scene.models))
        if k != self._attr_key:
            self._tri_attr = ACC.build_tri_attr(self.scene)
            self._attr_key = k
        return self._tri_attr

    def stack_size(self, capacity: int) -> int:
        _, meta, _, _ = self.blas()
        return ACC.required_stack_size(meta, capacity)


def make_rt_frame(meta, animate: Optional[Callable], n_tlas: int,
                  use_pallas: bool = False, paged: bool = False,
                  wide: bool = False, resplit: bool = False,
                  pack: int = 1):
    """Build the jitted two-level RT frame for one scene topology.

    ``meta``/``animate`` are host-side (closed over; anim node codes become
    jit constants) — rebuilt when the AccelCache's BLAS signature changes,
    the analogue of the reference's amortized buffer rebuilds. ``paged``
    selects the chunked-TLAS layout (ops/accel.assemble_scene_paged +
    the HBM->SMEM-streaming packet kernels) for scenes past the resident
    SMEM budget — see accel.prefer_paged."""

    @partial(
        jax.jit,
        static_argnames=(
            "width", "height", "stack_size", "shadow_samples",
            "reflection_samples", "ao_samples", "ao_radius", "leaf_cutout",
            "tlas_index", "reflection_half_rate", "cull_mask",
            "shadow_cull_mask", "compact_secondary", "compact_refl",
            "fuse_bounce",
        ),
    )
    def rt_frame2(
        blasset,
        anim_rest,
        anim_nodes,
        instances: InstanceArrays,
        inst_blas: jax.Array,
        masks,                      # tuple of bool[N], one per TLAS
        tri_attr: jax.Array,
        materials: MaterialTable,
        lights: Lights,
        camera: CameraMatrices,
        slot_materials: jax.Array,
        tonemap_params: TonemapParams,
        key: jax.Array,
        time: jax.Array,
        textures=None,
        inst_mask=None,             # i32[N] 8-bit visibility masks
        inst_opaque=None,           # bool[N] force-opaque flags
        *,
        width: int,
        height: int,
        stack_size: int,
        shadow_samples: int,
        reflection_samples: int,
        ao_samples: int,
        ao_radius: float,
        leaf_cutout: bool,
        tlas_index: int = 0,
        reflection_half_rate: bool = False,
        cull_mask: int = 0xFF,
        shadow_cull_mask: int = 0xFF,
        compact_secondary: bool = True,
        compact_refl: bool = False,
        fuse_bounce: bool = False,
    ):
        ctx = ACC.make_scene_tracer(
            blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
            masks, tri_attr, slot_materials, materials,
            tlas_index=tlas_index, stack_size=stack_size,
            leaf_cutout=leaf_cutout, use_pallas=use_pallas, paged=paged,
            textures=textures, time=time, animate=animate, wide=wide,
            pack=pack,
            inst_mask=inst_mask, inst_opaque=inst_opaque, resplit=resplit,
        )
        params = RTParams(
            shadow_samples=shadow_samples,
            reflection_samples=reflection_samples,
            ao_samples=ao_samples,
            ao_radius=ao_radius,
            leaf_cutout=leaf_cutout,
            reflection_half_rate=reflection_half_rate,
            cull_mask=cull_mask,
            shadow_cull_mask=shadow_cull_mask,
            compact_secondary=compact_secondary,
            compact_refl=compact_refl,
            fuse_bounce=fuse_bounce,
        )
        hdr = trace_frame(
            ctx, materials, lights, camera, key,
            width=width, height=height, params=params,
        )
        ldr = tonemap(hdr, tonemap_params)
        return ldr, {"hdr": hdr}

    return rt_frame2


class RayTraceRender:
    """Host-side RT pass (reference RayTrace.h:37-99 surface).

    ``add_tlas()`` mirrors ``addNewTLAS`` (RayTrace.cpp:159-170): each TLAS
    has its own instance list; ``render(camera, tlas=i)`` traces against
    TLAS ``i``. Hit-group management (rebuildPipeline + SBT offsets,
    RayTrace.cpp:116-152) is subsumed by the material table: adding a
    material never invalidates instances."""

    def __init__(
        self,
        scene: Scene,
        materials: MaterialRegistry,
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
        animate: Optional[Callable] = None,
        anim_resplit: bool = False,
        use_pallas: Optional[bool] = None,
        reflection_half_rate: bool = False,
        bvh_wide: bool = True,
        compact_refl: bool = False,     # group-compact + spatially sort only
        #                                  the reflection-side wavefronts
        #                                  (measured net loss under pack=2:
        #                                  66.1 vs 61.3 ms RT frame @1080p)
        fuse_bounce: bool = False,      # bounce ray rides the primary bundle
        compact_secondary: bool = False,  # group-compact secondary wavefronts
        #                                  (ops/compaction.py; result-identical)
        cull_mask: int = 0xFF,          # traceRayEXT cullMask for camera/
        #                                 reflection/AO rays (rgen:33)
        shadow_cull_mask: int = 0xFF,   # cullMask for shadow rays
        packet_pack: Optional[int] = None,  # rays/packet = 1024*pack; None =
        #                                 auto (2 resident / 1 paged — round-5
        #                                 A/B: small-union scenes gain ~1.6x
        #                                 from the shared stack walk, dense
        #                                 crowd unions lose)
    ):
        self.scene = scene
        self.materials = materials
        self.width = width
        self.height = height
        self.cull_mask = int(cull_mask) & 0xFF
        self.shadow_cull_mask = int(shadow_cull_mask) & 0xFF
        self.lights = lights or Lights.make(
            [{"position": (3.0, -4.0, 5.0), "color": (40.0, 40.0, 40.0), "bounds": 100.0}]
        )
        self.tonemap_params = tonemap_params or TonemapParams.default()
        self.shadow_samples = shadow_samples
        self.reflection_samples = reflection_samples
        self.ao_samples = ao_samples
        self.ao_radius = ao_radius
        self.reflection_half_rate = reflection_half_rate
        self.compact_secondary = compact_secondary
        self.compact_refl = compact_refl
        self.fuse_bounce = fuse_bounce
        self.animate = animate
        # re-sort anim BLAS leaf order at the animated pose each frame (the
        # reference's per-frame BLAS rebuild quality, main.cpp:908-921);
        # refit-only keeps rest-pose adjacency (updateTLAS refit semantics)
        self.anim_resplit = anim_resplit
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        # 4-wide grandchild box steps in the packet traversal (default ON:
        # composed RT frame 100 -> 88 ms @1080p, stable across runs; identical
        # hits — see trace_kernel._wide_box_step; the paged tracer honors it
        # too via trace_paged._wide_box_step_paged)
        self.bvh_wide = bvh_wide
        self.packet_pack = packet_pack
        self._key = jax.random.PRNGKey(seed)
        self._frame = 0
        # per-TLAS instance sets: index -> {slot: material id}
        self._tlas_bindings: List[Dict[int, Dict[int, int]]] = [{}]
        # per-instance RT visibility masks + force-opaque flags
        # (AccelerationStructureInstanceData parity, RayTrace.h:19-35)
        self._inst_masks: Dict[int, int] = {}
        self._inst_opaque: set = set()
        self.accel = AccelCache(scene)
        self._frame_fn = None
        self._frame_key = None
        # device-input caches (per-frame table re-uploads dominated host time)
        self._cache_dirty = True
        self._cached_slots = None
        self._cached_masks = None
        self._cached_table = None
        self._cached_textures = None
        self._cached_inst_mask = None
        self._cached_capacity = -1

    # -- TLAS management (addNewTLAS parity) ---------------------------------
    def add_tlas(self) -> int:
        self._tlas_bindings.append({})
        self._cache_dirty = True
        self._frame_fn = None
        return len(self._tlas_bindings) - 1

    @property
    def num_tlas(self) -> int:
        return len(self._tlas_bindings)

    def add_instance(
        self,
        instance: ModelInstance,
        materials: Optional[Dict[int, MaterialInstance]] = None,
        tlas: int = 0,
        *,
        mask: int = 0xFF,
        force_opaque: bool = False,
    ) -> None:
        """Register an instance in TLAS ``tlas``.

        ``mask`` is the instance's 8-bit visibility mask and
        ``force_opaque`` skips the any-hit alpha test on it — the
        reference's ``AccelerationStructureInstanceData{mask:8, flags}``
        (RayTrace.h:19-35; example usage main.cpp:611-612). A trace sees
        the instance only when ``mask & cull_mask != 0``."""
        if instance.index < 0:
            self.scene.add_instance(instance)
        binds: Dict[int, int] = {}
        for slot, mat in (materials or {}).items():
            binds[slot] = self.materials.register(mat)
        self._tlas_bindings[tlas][instance.index] = binds
        self._inst_masks[instance.index] = int(mask) & 0xFF
        if force_opaque:
            self._inst_opaque.add(instance.index)
        else:
            self._inst_opaque.discard(instance.index)
        self._cache_dirty = True

    def add_instances_from(self, render_pass, tlas: int = 0) -> None:
        """Adopt a RenderPass's instance set + per-slot material bindings.

        The raster<->RT mode switch of the reference example renders ONE
        scene through either pipeline (GuiRender.cpp:79-87); this mirrors
        an existing raster pass into this RT pass so both modes show the
        same content. Requires the SAME MaterialRegistry (binding rows are
        registry ids)."""
        if render_pass.materials is not self.materials:
            raise ValueError("renders must share a MaterialRegistry")
        for idx, binds in render_pass._bindings.items():
            self._tlas_bindings[tlas][idx] = dict(binds)
        self._cache_dirty = True

    def remove_instance(self, instance: ModelInstance, tlas: Optional[int] = None) -> None:
        sets = self._tlas_bindings if tlas is None else [self._tlas_bindings[tlas]]
        for b in sets:
            b.pop(instance.index, None)
        if tlas is None or not any(
                instance.index in b for b in self._tlas_bindings):
            self._inst_masks.pop(instance.index, None)
            self._inst_opaque.discard(instance.index)
        self._cache_dirty = True

    def set_instance_mask(self, instance: ModelInstance, mask: int) -> None:
        """Update an instance's 8-bit RT visibility mask live (the
        reference re-stages the instance record on change)."""
        self._inst_masks[instance.index] = int(mask) & 0xFF
        self._cache_dirty = True

    def invalidate(self) -> None:
        """Force re-upload of material tables after live edits."""
        self._cache_dirty = True

    # -- device inputs --------------------------------------------------------
    def _slot_material_array(self, capacity: int) -> jax.Array:
        s = max(1, self.scene.max_slots)
        arr = np.zeros((capacity, s), np.int32)
        for binds_by_inst in self._tlas_bindings:
            for idx, binds in binds_by_inst.items():
                if 0 <= idx < capacity:
                    for slot, mid in binds.items():
                        if slot < s:
                            arr[idx, slot] = mid
        return jnp.asarray(arr)

    def _mask_arrays(self, capacity: int):
        masks = []
        for binds_by_inst in self._tlas_bindings:
            m = np.zeros(capacity, bool)
            for idx in binds_by_inst:
                if 0 <= idx < capacity:
                    m[idx] = True
            masks.append(jnp.asarray(m))
        return tuple(masks)

    def _inst_mask_arrays(self, capacity: int):
        m = np.full(capacity, 0xFF, np.int32)
        for idx, v in self._inst_masks.items():
            if 0 <= idx < capacity:
                m[idx] = v
        o = np.zeros(capacity, bool)
        for idx in self._inst_opaque:
            if 0 <= idx < capacity:
                o[idx] = True
        return jnp.asarray(m), jnp.asarray(o)

    def _device_inputs(self, capacity: int):
        if self._cache_dirty or capacity != self._cached_capacity:
            self._cached_slots = self._slot_material_array(capacity)
            self._cached_masks = self._mask_arrays(capacity)
            self._cached_table = self.materials.table()
            self._cached_textures = self.materials.texture_arrays()
            self._cached_inst_mask = self._inst_mask_arrays(capacity)
            self._cached_capacity = capacity
            self._cache_dirty = False
        return self._cached_slots, self._cached_masks, self._cached_table

    def render(self, camera: Camera | CameraMatrices, *, tlas: int = 0,
               time: float = 0.0):
        cam = camera.matrices if isinstance(camera, Camera) else camera
        instances = self.scene.flush()
        blasset, meta, anim_rest, anim_nodes = self.accel.blas()
        paged = self.use_pallas and ACC.prefer_paged(
            meta, instances.capacity, max(1, self.scene.max_slots))
        pack = self.packet_pack if self.packet_pack else (1 if paged else 2)
        key_sig = (self.accel._blas_key, len(self._tlas_bindings), paged,
                   self.bvh_wide, self.anim_resplit, pack)
        if self._frame_fn is None or self._frame_key != key_sig:
            self._frame_fn = make_rt_frame(
                meta, self.animate, len(self._tlas_bindings),
                use_pallas=self.use_pallas, paged=paged, wide=self.bvh_wide,
                resplit=self.anim_resplit, pack=pack,
            )
            self._frame_key = key_sig
        slots, masks, table = self._device_inputs(instances.capacity)
        inst_mask, inst_opaque = self._cached_inst_mask
        self._frame += 1
        key = jax.random.fold_in(self._key, self._frame)
        return self._frame_fn(
            blasset, anim_rest, anim_nodes, instances,
            self.accel.inst_blas(instances.capacity), masks,
            self.accel.tri_attr(),
            table, self.lights, cam, slots, self.tonemap_params, key,
            jnp.float32(time), self._cached_textures,
            inst_mask, inst_opaque,
            width=self.width,
            height=self.height,
            stack_size=self.accel.stack_size(instances.capacity),
            shadow_samples=self.shadow_samples,
            reflection_samples=self.reflection_samples,
            ao_samples=self.ao_samples,
            ao_radius=self.ao_radius,
            leaf_cutout=self.materials.has_leaf,
            tlas_index=tlas,
            reflection_half_rate=self.reflection_half_rate,
            cull_mask=self.cull_mask,
            shadow_cull_mask=self.shadow_cull_mask,
            compact_secondary=self.compact_secondary,
            compact_refl=self.compact_refl,
            fuse_bounce=self.fuse_bounce,
        )
