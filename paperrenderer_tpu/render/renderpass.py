"""RenderPass: raster frame orchestration.

Reference parity: ``RenderPass`` (src/PaperRenderer/RenderPass.h:103-134) owns
a per-pass instance list with per-material-slot bindings, runs the preprocess
compute, then walks the material tree issuing indirect draws
(RenderPass.cpp:444-742). Here the whole pass is ONE jitted function:

    preprocess (cull+LOD+draw build) -> triangle batch -> rasterize
      -> G-buffer resolve -> deferred shade -> tonemap

The reference's timeline semaphores, barriers, and render-tree walk disappear:
ordering is data dependence inside the traced graph; the "material tree" is a
material-id table lookup at shade time. Translucent sorted-instance support
(RenderPass.cpp:560-709) is handled by a back-to-front blended second pass
keyed off SHADE_TRANSLUCENT materials (see ``sorted_blend`` — round-robin of
draw order replaced by a depth sort of translucent fragments).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera, CameraMatrices
from ..core.material import MaterialInstance, MaterialRegistry, MaterialTable
from ..core.model import ModelInstance
from ..core.scene import InstanceArrays, Scene, SceneTables
from ..core.geometry import GeometryArrays
from ..ops import raster as R
from ..ops import preprocess as P
from ..ops.shading import Lights, shade_gbuffer
from ..ops.tonemap import TonemapParams, tonemap


def _tier(n: int, floor: int = 2048) -> int:
    """Geometric 1.25x capacity tiers (static shapes) — see
    ops.static_batch._tier for the rationale vs pow2."""
    from ..ops.static_batch import _tier as _t

    return _t(n, floor)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_meshes_per_lod", "tri_capacity", "do_culling",
        "use_pallas", "supersample",
    ),
)
def render_frame(
    instances: InstanceArrays,
    tables: SceneTables,
    geo: GeometryArrays,
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    slot_materials: jax.Array,      # i32[N, S]
    instance_visible: jax.Array,    # bool[N]
    tonemap_params: TonemapParams,
    textures=None,
    *,
    width: int,
    height: int,
    max_meshes_per_lod: int,
    tri_capacity: int,
    do_culling: bool = True,
    use_pallas: bool = False,
    supersample: int = 1,
):
    """The full raster frame as one compiled graph (draw-list path).

    This is the reference-parity path: per-frame GPU-driven draw build via
    preprocess + compaction, mirroring IndirectDrawBuild.comp semantics. The
    performance path is ``render_frame_static`` (pre-expanded triangles +
    binned Pallas raster). ``supersample`` matches render_frame_static's
    SSAA contract so the two paths stay image-comparable.
    """
    ss = max(1, int(supersample))
    width, height = width * ss, height * ss
    pre = P.preprocess_instances(
        instances, tables, camera,
        max_meshes_per_lod=max_meshes_per_lod,
        do_culling=do_culling,
        instance_visible=instance_visible,
        slot_materials=slot_materials,
    )
    batch = R.build_triangle_batch(pre, geo, camera, capacity=tri_capacity)
    batch = R.attach_cull(batch, materials)
    if use_pallas:
        from ..ops.raster_pallas import rasterize_tiles

        depth, tid, bary = rasterize_tiles(batch, width, height)
    else:
        depth, tid, bary = R.rasterize(batch, width, height)
    gbuf = R.resolve_gbuffer(batch, depth, tid, bary)
    hdr = shade_gbuffer(gbuf, materials, lights, camera.cam_pos,
                        textures=textures)
    if ss > 1:
        # strided-slice box resolve (see render_frame_static: reshape views
        # with tiny minor dims materialize padded intermediates on TPU)
        acc = hdr[0::ss, 0::ss]
        for i in range(ss):
            for j in range(ss):
                if i or j:
                    acc = acc + hdr[i::ss, j::ss]
        hdr = acc * (1.0 / (ss * ss))
        depth = depth[::ss, ::ss]
    ldr = tonemap(hdr, tonemap_params)
    aux = {
        "visible_count": jnp.sum(pre.visible.astype(jnp.int32)),
        "draw_count": pre.draw_count,
        "total_tris": pre.total_tris,
        "coverage": jnp.mean(gbuf.coverage.astype(jnp.float32)),
        "depth": depth,
        "hdr": hdr,
    }
    return ldr, aux


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "do_culling", "use_pallas", "work_capacity",
        "translucent_layers", "supersample",
    ),
)
def render_frame_static(
    mapping,                      # ops.static_batch.StaticMapping
    instances: InstanceArrays,
    tables: SceneTables,
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    instance_visible: jax.Array,
    tonemap_params: TonemapParams,
    textures=None,
    *,
    width: int,
    height: int,
    do_culling: bool = True,
    use_pallas: bool = True,
    work_capacity: int = 0,
    translucent_layers: int = 0,
    supersample: int = 1,
):
    """Fast raster frame: static triangle expansion + binned Pallas raster.

    ``translucent_layers > 0`` adds the sorted-translucency pass (depth
    peeling + back-to-front blend) over SHADE_TRANSLUCENT materials.

    ``supersample`` is the TPU-native analogue of the reference's MSAA
    sample count (RenderPass.h:61 ``sampleCount``): the frame rasterizes
    and shades at s x s the resolution and box-filters the HDR target
    before tonemap (ordered supersampling — a superset of MSAA's
    edge-only multisampling, chosen because on TPU the shading cost is
    one fused VPU pass, not a per-sample fragment dispatch)."""
    from ..ops.static_batch import expand_static

    ss = max(1, int(supersample))
    out_w, out_h = width, height
    width, height = width * ss, height * ss

    batch, inst_visible = expand_static(
        mapping, instances, tables, camera, slot_materials, instance_visible,
        do_culling=do_culling,
    )
    batch = R.attach_cull(batch, materials)
    full_batch = batch
    if translucent_layers > 0:
        # opaque pass must not z-write translucent/cutout geometry
        import dataclasses as _dc

        from ..ops.translucency import non_opaque_mask

        opaque = ~non_opaque_mask(materials, batch.material)
        batch = _dc.replace(batch, valid=batch.valid & opaque)
    if use_pallas:
        from ..ops.raster_exact import rasterize_exact, resolve_gbuffer_pairs

        depth, tid, attr_pairs, required = rasterize_exact(
            batch, width, height,
            pair_capacity=work_capacity or None,
        )
        gbuf = resolve_gbuffer_pairs(attr_pairs, depth, tid, camera)
    else:
        depth, tid, bary = R.rasterize(batch, width, height)
        required = jnp.int32(0)
        gbuf = R.resolve_gbuffer_packed(
            R.pack_attributes(batch), depth, tid, bary, camera
        )
    hdr = shade_gbuffer(gbuf, materials, lights, camera.cam_pos,
                        textures=textures)
    if translucent_layers > 0:
        from ..ops.translucency import composite_translucency

        hdr, peel_required = composite_translucency(
            hdr, depth, full_batch, materials, lights, camera,
            layers=translucent_layers,
            use_exact=use_pallas, pair_capacity=work_capacity,
            textures=textures,
        )
        # translucent-heavy scenes can out-demand the opaque pass; the
        # overflow-growth protocol keys off the max of both
        required = jnp.maximum(required, peel_required)
    if ss > 1:
        # box-filter the HDR target down to the output resolution (the
        # MSAA resolve analogue), then tonemap at native res; aux depth
        # keeps the top-left sample of each s x s cell. Strided slices, NOT
        # a reshape(out_h, ss, out_w, ss, 3) view: tiny-minor-dim reshapes
        # materialize T(8,128)-padded intermediates on TPU (the raster_exact
        # lane-layout lesson; ~17 GiB at 1080p ss=2)
        acc = hdr[0::ss, 0::ss]
        for i in range(ss):
            for j in range(ss):
                if i or j:
                    acc = acc + hdr[i::ss, j::ss]
        hdr = acc * (1.0 / (ss * ss))
        depth = depth[::ss, ::ss]
    ldr = tonemap(hdr, tonemap_params)
    aux = {
        "visible_count": jnp.sum(inst_visible.astype(jnp.int32)),
        "total_tris": jnp.sum(batch.valid.astype(jnp.int32)),
        "coverage": jnp.mean(gbuf.coverage.astype(jnp.float32)),
        "required_work": required,
        "depth": depth,
        "hdr": hdr,
    }
    return ldr, aux


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "do_culling", "translucent_layers", "supersample",
    ),
)
def measure_frame_demand(
    mapping,
    instances: InstanceArrays,
    tables: SceneTables,
    materials: MaterialTable,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    instance_visible: jax.Array,
    *,
    width: int,
    height: int,
    do_culling: bool = True,
    translucent_layers: int = 0,
    supersample: int = 1,
):
    """Pair/slot demand of a frame WITHOUT compiling/running the raster
    pipeline (ops.raster_exact.measure_pair_demand over the same expanded
    batch render_frame_static would rasterize, opaque and translucent
    passes both). The capacity-sizing probe RenderPass runs at topology
    changes — the reference sizes mesh-group buffers the same way before
    rebuilding them (IndirectDraw.cpp:44-125) rather than rendering at a
    guessed capacity first."""
    from ..ops.raster_exact import measure_pair_demand
    from ..ops.static_batch import expand_static

    ss = max(1, int(supersample))
    width, height = width * ss, height * ss
    batch, _vis = expand_static(
        mapping, instances, tables, camera, slot_materials, instance_visible,
        do_culling=do_culling,
    )
    batch = R.attach_cull(batch, materials)
    if translucent_layers > 0:
        import dataclasses as _dc

        from ..ops.translucency import non_opaque_mask

        non_op = non_opaque_mask(materials, batch.material)
        req = measure_pair_demand(
            _dc.replace(batch, valid=batch.valid & ~non_op), width, height)
        treq = measure_pair_demand(
            _dc.replace(batch, valid=batch.valid & non_op), width, height)
        return jnp.maximum(req, treq)
    return measure_pair_demand(batch, width, height)


class RenderPass:
    """Host-side raster pass (reference RenderPass.h:103-134 surface)."""

    def __init__(
        self,
        scene: Scene,
        materials: MaterialRegistry,
        *,
        width: int = 512,
        height: int = 512,
        do_culling: bool = True,
        lights: Optional[Lights] = None,
        tonemap_params: Optional[TonemapParams] = None,
        use_pallas: Optional[bool] = None,
        translucent_layers: int = 0,
        supersample: int = 1,
    ):
        self.scene = scene
        self.materials = materials
        self.width = width
        self.height = height
        self.do_culling = do_culling
        # MSAA sample-count analogue (RenderPass.h:61): rasterize + shade at
        # supersample^2 the pixel rate, box-resolve the HDR target
        self.supersample = max(1, int(supersample))
        if use_pallas is None:
            # Pallas tile raster on TPU when the image tiles evenly;
            # pure-XLA fallback elsewhere (CPU tests, odd sizes)
            from ..ops.raster_pallas import TILE_H, TILE_W

            use_pallas = (
                jax.default_backend() not in ("cpu",)
                and width % TILE_W == 0
                and height % TILE_H == 0
            )
        self.use_pallas = use_pallas
        self.translucent_layers = int(translucent_layers)
        # default key light: intensity sized for unit-scale scenes under the
        # windowed-1/d^2 attenuation (pbr.glsl:104-108)
        self.lights = lights or Lights.make(
            [{"position": (3.0, -4.0, 5.0), "color": (40.0, 40.0, 40.0), "bounds": 100.0}]
        )
        self.tonemap_params = tonemap_params or TonemapParams.default()
        # per-pass instance state: index -> {slot: material id}
        self._bindings: Dict[int, Dict[int, int]] = {}
        self._visible: Dict[int, bool] = {}
        self._tri_capacity = 2048
        # device-input caches (rebuilt only when bindings/materials change —
        # uploading these per frame dominated frame time before)
        self._cache_dirty = True
        self._cached_slots = None
        self._cached_visible = None
        self._cached_table = None
        self._cached_textures = None
        self._cached_capacity = -1
        # static fast path: pre-expanded triangles keyed on scene.version
        self._mapping = None
        self._mapping_version = -1
        self._work_capacity = 0   # 0 = kernel default; grown on overflow
        self._check_overflow = True
        self._last_required = None  # previous frame's demand (device scalar)
        # Fetch the demand scalar every N frames, not every frame: on the
        # axon tunnel a 4-byte device->host scalar read costs ~1.3 ms even
        # when the value is already materialized (measured round 4), which
        # was ~15% of the whole 512^2 frame. Below the 128 MiB pair-table
        # cap the kernel's in-graph 4x fallback keeps spike frames complete,
        # so deferring growth by up to N frames loses nothing; past the cap
        # a spike drops fragments for up to N frames instead of one.
        self._overflow_stride = 8
        self._overflow_phase = 0

    # -- instance registration (RenderPass::addInstance, :744-801) ----------
    def add_instance(
        self,
        instance: ModelInstance,
        materials: Optional[Dict[int, MaterialInstance]] = None,
    ) -> None:
        if instance.index < 0:
            self.scene.add_instance(instance)
        binds: Dict[int, int] = {}
        for slot, mat in (materials or {}).items():
            binds[slot] = self.materials.register(mat)
        self._bindings[instance.index] = binds
        self._visible[instance.index] = True
        self._cache_dirty = True

    def remove_instance(self, instance: ModelInstance) -> None:
        self._bindings.pop(instance.index, None)
        self._visible.pop(instance.index, None)
        self._cache_dirty = True

    def set_instance_visibility(self, instance: ModelInstance, visible: bool) -> None:
        self._visible[instance.index] = visible
        self._cache_dirty = True

    def invalidate(self) -> None:
        """Force re-upload of material/visibility tables (call after editing
        a registered Material's parameters live)."""
        self._cache_dirty = True

    def resize(self, width: int, height: int) -> None:
        """Change the render resolution (the swapchain-recreate analogue,
        Swapchain.cpp:378-402): next render compiles for the new size."""
        self.width = int(width)
        self.height = int(height)
        self._work_capacity = 0
        self._check_overflow = True

    # -- per-frame device inputs --------------------------------------------
    def _slot_material_array(self, capacity: int) -> jax.Array:
        s = max(1, self.scene.max_slots)
        arr = np.zeros((capacity, s), np.int32)
        for idx, binds in self._bindings.items():
            if 0 <= idx < capacity:
                for slot, mid in binds.items():
                    if slot < s:
                        arr[idx, slot] = mid
        return jnp.asarray(arr)

    def _visible_array(self, capacity: int) -> jax.Array:
        arr = np.ones((capacity,), bool)
        for idx, vis in self._visible.items():
            if 0 <= idx < capacity:
                arr[idx] = vis
        return jnp.asarray(arr)

    def _required_tri_capacity(self) -> int:
        total = 0
        for inst in self.scene.instances:
            # worst case: the densest LOD of each instance is drawn
            total += max(
                sum(mm.handle.tri_count for mm in lod.meshes)
                for lod in inst.model.lods
            )
        return _tier(total)

    def _device_inputs(self, capacity: int):
        if self._cache_dirty or capacity != self._cached_capacity:
            self._cached_slots = self._slot_material_array(capacity)
            self._cached_visible = self._visible_array(capacity)
            self._cached_table = self.materials.table()
            self._cached_textures = self.materials.texture_arrays()
            self._cached_capacity = capacity
            self._cache_dirty = False
        return self._cached_slots, self._cached_visible, self._cached_table

    def _grow_work_capacity(self, required: int) -> None:
        # 1.25x headroom, 4096-slot tiers (pow2 tiers left the kernel grid
        # mostly padding at large scenes)
        self._work_capacity = -(-int(required * 1.25) // 4096) * 4096

    def _adopt_work_demand(self, required: int, cap: int) -> bool:
        """Adopt a measured pair demand: grow when the capacity overflowed,
        and TIGHTEN when it is >2x oversized (hysteresis vs the 1.25x
        headroom, so a stable camera recompiles at most once). Tightening
        matters at scale: the tri-count default is pessimistic — at 100k
        instances @1080p it sizes 1.34M pairs for a 630k demand, which is
        2x the kernel steps, a second work-list page, and the 10-25%-slower
        lane layout (docs/PERF.md)."""
        if required > cap or required * 2 < cap:
            self._grow_work_capacity(required)
            return self._work_capacity != cap
        return False

    def _consume_overflow_signal(self, mapping) -> None:
        """Deferred overflow growth: consult the previous frame's
        ``required_work`` (device scalar) every ``_overflow_stride`` (8)
        frames, and only when already materialized — never stalling the
        pipeline (the fetch costs ~1.3 ms through the axon tunnel). While
        the pair table is <= 128 MiB the rasterizer's in-graph lax.cond
        fallback (4x capacity) keeps spiking frames complete throughout;
        past that cap (raster_exact.rasterize_exact's cf_bytes guard) a
        demand spike can drop fragments for up to ``_overflow_stride``
        frames before this deferred growth adopts the new demand."""
        prev = self._last_required
        if prev is None:
            return
        self._overflow_phase = (self._overflow_phase + 1) % self._overflow_stride
        if self._overflow_phase != 0:
            return
        ready = getattr(prev, "is_ready", None)
        if ready is not None and not ready():
            return
        self._last_required = None
        from ..ops.raster_exact import default_pair_capacity

        required = int(prev)
        # capacity baseline at the RASTER resolution (supersample included):
        # the kernel sizes its in-graph default from ss*W x ss*H, so a
        # native-res baseline would misread normal ss>1 demand as overflow
        cap = self._work_capacity or default_pair_capacity(
            self.width * self.supersample, self.height * self.supersample,
            mapping.capacity
        )
        self._adopt_work_demand(required, cap)

    def _current_mapping(self):
        from ..ops.static_batch import build_static_mapping

        if self._mapping is None or self._mapping_version != self.scene.version:
            self._mapping = build_static_mapping(self.scene)
            self._mapping_version = self.scene.version
            self._check_overflow = True
        return self._mapping

    def render(
        self,
        camera: Camera | CameraMatrices,
        *,
        static_path: bool = True,
        statistics=None,
    ):
        """Render one frame; returns (ldr f32[H, W, 3], aux dict).

        ``static_path=True`` (default) uses the pre-expanded triangle buffer +
        binned Pallas raster; False runs the reference-parity per-frame
        draw-list build (IndirectDrawBuild semantics). Pass a
        StatisticsTracker to record the submission timer (the reference's
        "RenderPass Submission" timer, RenderPass.cpp:447).
        """
        from ..utils.stats import StatisticsTracker, Timer

        if statistics is not None:
            with Timer(statistics, "RenderPass Submission"):
                return self.render(camera, static_path=static_path)
        cam = camera.matrices if isinstance(camera, Camera) else camera
        instances = self.scene.flush()
        slots, visible, table = self._device_inputs(instances.capacity)
        if static_path:
            mapping = self._current_mapping()
            if self.use_pallas and self._check_overflow:
                # blocking capacity probe right after a topology change /
                # resize (reference buffer-growth analogue): size the work
                # capacity from the cheap demand measurement BEFORE the
                # first full render, so only ONE raster program is compiled
                # at this topology (the old probe rendered at a guessed
                # capacity, then recompiled at the adopted one — two
                # multi-minute remote compiles at 100k-instance scale)
                from ..ops.raster_exact import default_pair_capacity

                required = int(measure_frame_demand(
                    mapping, instances, self.scene.tables(), table, cam,
                    slots, visible,
                    width=self.width, height=self.height,
                    do_culling=self.do_culling,
                    translucent_layers=self.translucent_layers,
                    supersample=self.supersample,
                ))
                cap = self._work_capacity or default_pair_capacity(
                    self.width * self.supersample,
                    self.height * self.supersample, mapping.capacity
                )
                self._adopt_work_demand(required, cap)
                self._check_overflow = False
            elif self.use_pallas:
                self._consume_overflow_signal(mapping)
            kwargs = dict(
                width=self.width, height=self.height,
                do_culling=self.do_culling, use_pallas=self.use_pallas,
                work_capacity=self._work_capacity,
                translucent_layers=self.translucent_layers,
                supersample=self.supersample,
            )
            ldr, aux = render_frame_static(
                mapping, instances, self.scene.tables(), table,
                self.lights, cam, slots, visible, self.tonemap_params,
                self._cached_textures, **kwargs,
            )
            if self.use_pallas:
                # steady state: below the 128 MiB pair-table cap the kernel's
                # in-graph 4x fallback keeps THIS frame complete even if the
                # camera blew past capacity (above the cap a spike frame may
                # drop fragments — rasterize_exact's cf_bytes guard); either
                # way keep the demand scalar so the next render call grows
                # the persistent capacity
                self._last_required = aux["required_work"]
            return ldr, aux
        need = self._required_tri_capacity()
        if need > self._tri_capacity:
            self._tri_capacity = need
        return render_frame(
            instances,
            self.scene.tables(),
            self.scene.geometry(),
            table,
            self.lights,
            cam,
            slots,
            visible,
            self.tonemap_params,
            self._cached_textures,
            width=self.width,
            height=self.height,
            max_meshes_per_lod=self.scene.max_meshes_per_lod,
            tri_capacity=self._tri_capacity,
            do_culling=self.do_culling,
            use_pallas=self.use_pallas,
            supersample=self.supersample,
        )
