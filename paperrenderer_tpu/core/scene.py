"""Scene: global model/instance registries + device-side SoA buffers.

This is the TPU-native analogue of the reference RenderEngine's global state:
  * the instances SoA buffer of ``ShaderModelInstance`` records rebuilt at
    1.4x overhead when full (PaperRenderer.cpp:151-196),
  * the model-data FragmentableBuffer of shader blobs (:93-149),
  * swap-remove registries with back-pointer fixup (addObject/removeObject
    :255-306),
  * the per-frame dirty-set staging queue (queueModelsAndInstancesTransfers
    :308-363).

Device representation: 64-bit BDA pointers become int32 offsets into dense
tables. All arrays have static *capacities*; `count` scalars carry the live
size. Growth reallocates host-side at 1.4x (amortized recompile), exactly the
reference's overhead strategy but at trace granularity.

Dirty-row staging is a jitted scatter of a fixed-capacity batch — the
double-buffered staging ring (StagingBuffer.cpp:73-151) becomes one
``device_put`` of packed rows + one fused scatter per frame.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import GeometryArena, GeometryArrays
from .model import Model, ModelInstance

GROWTH = 1.4          # PaperRenderer.h:70
INSTANCE_FLOOR = 128  # PaperRenderer.cpp:158


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneTables:
    """Static model/LOD/mesh lookup tables (rebuilt only when models change)."""

    model_aabb_min: jax.Array   # f32[M, 3]
    model_aabb_max: jax.Array   # f32[M, 3]
    model_lod_offset: jax.Array  # i32[M] — first LOD row
    model_lod_count: jax.Array   # i32[M]
    lod_mesh_offset: jax.Array   # i32[L] — first mesh row of this LOD
    lod_mesh_count: jax.Array    # i32[L]
    mesh_tri_offset: jax.Array   # i32[K] — into the geometry arena index buffer
    mesh_tri_count: jax.Array    # i32[K]
    mesh_vertex_offset: jax.Array  # i32[K]
    mesh_vertex_count: jax.Array   # i32[K]
    mesh_slot: jax.Array         # i32[K] — material slot within the model


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InstanceArrays:
    """Global instance SoA (reference ShaderModelInstance, Model.h:161-168)."""

    pos: jax.Array       # f32[N, 3]
    scale: jax.Array     # f32[N, 3]
    quat: jax.Array      # f32[N, 4] (w,x,y,z)
    model_id: jax.Array  # i32[N], -1 = dead slot

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def alive(self) -> jax.Array:
        return self.model_id >= 0


@partial(jax.jit, donate_argnums=0)
def _scatter_rows(
    arrays: InstanceArrays,
    idx: jax.Array,       # i32[B], out-of-range rows are dropped by XLA
    pos: jax.Array,       # f32[B, 3]
    scale: jax.Array,     # f32[B, 3]
    quat: jax.Array,      # f32[B, 4]
    model_id: jax.Array,  # i32[B]
) -> InstanceArrays:
    """Fused staged-upload scatter (the staging-buffer submitTransfers analogue)."""
    mode = "drop"
    return InstanceArrays(
        pos=arrays.pos.at[idx].set(pos, mode=mode),
        scale=arrays.scale.at[idx].set(scale, mode=mode),
        quat=arrays.quat.at[idx].set(quat, mode=mode),
        model_id=arrays.model_id.at[idx].set(model_id, mode=mode),
    )


def _grow(n: int, floor: int = INSTANCE_FLOOR) -> int:
    cap = max(floor, int(np.ceil(n * GROWTH)))
    return ((cap + 127) // 128) * 128


class Scene:
    """Host-side registry; owns the geometry arena, model tables, instances.

    When the native scenecore library is built (make -C native), the instance
    SoA lives in a C++ DeltaPacker: transform writes and dirty-row packing run
    native (the reference's C++ registry/staging hot loops), and full uploads
    are zero-copy views. Pure-python fallback otherwise.
    """

    def __init__(self, arena: Optional[GeometryArena] = None, use_native: bool = True):
        self.arena = arena or GeometryArena(use_native=use_native)
        self.models: List[Model] = []
        self.instances: List[ModelInstance] = []
        self._dirty: Set[int] = set()
        self._native = None
        if use_native:
            try:
                from ..native import AVAILABLE, NativeDeltaPacker

                if AVAILABLE:
                    self._native = NativeDeltaPacker(INSTANCE_FLOOR)
            except Exception:
                self._native = None
        self._tables: Optional[SceneTables] = None
        self._tables_dirty = True
        self._capacity = INSTANCE_FLOOR
        self._device: Optional[InstanceArrays] = None
        self._full_upload = True
        self.max_meshes_per_lod = 1  # static bound used by the preprocess kernel
        self.max_slots = 1
        # topology version: bumps on instance add/remove + model registration;
        # consumers (static mappings, BVH caches) key their rebuilds on it
        self.version = 0

    # -- models --------------------------------------------------------------
    def register_model(self, model: Model) -> int:
        model.model_id = len(self.models)
        self.models.append(model)
        self._tables_dirty = True
        self.version += 1
        self.max_meshes_per_lod = max(
            self.max_meshes_per_lod,
            max(len(l.meshes) for l in model.lods),
        )
        self.max_slots = max(self.max_slots, model.num_slots)
        return model.model_id

    def tables(self) -> SceneTables:
        if self._tables_dirty or self._tables is None:
            m = max(1, len(self.models))
            aabb_min = np.zeros((m, 3), np.float32)
            aabb_max = np.zeros((m, 3), np.float32)
            lod_off = np.zeros(m, np.int32)
            lod_cnt = np.zeros(m, np.int32)
            lod_mesh_off: List[int] = []
            lod_mesh_cnt: List[int] = []
            tri_off: List[int] = []
            tri_cnt: List[int] = []
            v_off: List[int] = []
            v_cnt: List[int] = []
            slot: List[int] = []
            for i, model in enumerate(self.models):
                aabb_min[i] = model.aabb_min
                aabb_max[i] = model.aabb_max
                lod_off[i] = len(lod_mesh_off)
                lod_cnt[i] = len(model.lods)
                for lod in model.lods:
                    lod_mesh_off.append(len(tri_off))
                    lod_mesh_cnt.append(len(lod.meshes))
                    for mm in lod.meshes:
                        tri_off.append(mm.handle.tri_offset)
                        tri_cnt.append(mm.handle.tri_count)
                        v_off.append(mm.handle.vertex_offset)
                        v_cnt.append(mm.handle.vertex_count)
                        slot.append(mm.material_slot)
            as_i32 = lambda xs: jnp.asarray(np.asarray(xs or [0], np.int32))
            self._tables = SceneTables(
                model_aabb_min=jnp.asarray(aabb_min),
                model_aabb_max=jnp.asarray(aabb_max),
                model_lod_offset=jnp.asarray(lod_off),
                model_lod_count=jnp.asarray(lod_cnt),
                lod_mesh_offset=as_i32(lod_mesh_off),
                lod_mesh_count=as_i32(lod_mesh_cnt),
                mesh_tri_offset=as_i32(tri_off),
                mesh_tri_count=as_i32(tri_cnt),
                mesh_vertex_offset=as_i32(v_off),
                mesh_vertex_count=as_i32(v_cnt),
                mesh_slot=as_i32(slot),
            )
            self._tables_dirty = False
        return self._tables

    def geometry(self) -> GeometryArrays:
        return self.arena.device_arrays()

    def compact_geometry(self) -> None:
        """Compact the geometry arena and fix up every model's mesh handles
        off the relocation remap — the engine-side compaction callback
        (reference PaperRenderer.cpp:129-149: compaction invalidates and
        re-references all owners). Bumps the topology version so static
        mappings, BLAS sets, and attr tables rebuild."""
        import dataclasses as _dc

        remap = self.arena.compact()
        for model in self.models:
            new_lods = []
            for lod in model.lods:
                new_meshes = tuple(
                    _dc.replace(mm, handle=remap.get(mm.handle.mesh_id, mm.handle))
                    for mm in lod.meshes
                )
                new_lods.append(_dc.replace(lod, meshes=new_meshes))
            model.lods = tuple(new_lods)
        self._tables_dirty = True
        self.version += 1

    # -- instances (swap-remove registry, PaperRenderer.cpp:255-306) ----------
    def add_instance(self, instance: ModelInstance) -> ModelInstance:
        if instance.model.model_id < 0:
            self.register_model(instance.model)
        instance.index = len(self.instances)
        instance._scene = self
        self.instances.append(instance)
        self._dirty.add(instance.index)
        self.version += 1
        if len(self.instances) > self._capacity:
            self._capacity = _grow(len(self.instances))
            self._full_upload = True
        if self._native is not None:
            if self._native.capacity < self._capacity:
                self._native.grow(self._capacity)
            self._native.set(
                instance.index,
                pos=instance.position, scale=instance.scale,
                quat=instance.rotation, model_id=instance.model.model_id,
            )
        return instance

    def remove_instance(self, instance: ModelInstance) -> None:
        idx = instance.index
        if idx < 0 or idx >= len(self.instances) or self.instances[idx] is not instance:
            return
        if self._native is not None:
            self._native.swap_remove(idx, len(self.instances) - 1)
        last = self.instances.pop()
        if last is not instance:
            # swap-remove: the previously-last instance takes the freed slot
            last.index = idx
            self.instances[idx] = last
            self._dirty.add(idx)
        self._dirty.add(len(self.instances))  # stale tail row -> model_id -1
        instance.index = -1
        instance._scene = None
        self.version += 1

    def mark_instance_dirty(self, instance: ModelInstance) -> None:
        if instance.index >= 0:
            self._dirty.add(instance.index)
            if self._native is not None:
                self._native.set(
                    instance.index,
                    pos=instance.position, scale=instance.scale,
                    quat=instance.rotation, model_id=instance.model.model_id,
                )

    @property
    def count(self) -> int:
        return len(self.instances)

    # -- device sync -----------------------------------------------------------
    def _build_full(self) -> InstanceArrays:
        cap = self._capacity
        if self._native is not None:
            if self._native.capacity < cap:
                self._native.grow(cap)
            self._native._lib.packer_clear_dirty(self._native._h)
            pos_v, scale_v, quat_v, model_v = self._native.views()
            for inst in self.instances:
                inst.dirty = False
            return InstanceArrays(
                pos=jnp.asarray(pos_v[:cap]),
                scale=jnp.asarray(scale_v[:cap]),
                quat=jnp.asarray(quat_v[:cap]),
                model_id=jnp.asarray(model_v[:cap]),
            )
        pos = np.zeros((cap, 3), np.float32)
        scale = np.ones((cap, 3), np.float32)
        quat = np.tile(np.asarray([1, 0, 0, 0], np.float32), (cap, 1))
        model_id = np.full((cap,), -1, np.int32)
        for i, inst in enumerate(self.instances):
            pos[i] = inst.position
            scale[i] = inst.scale
            quat[i] = inst.rotation
            model_id[i] = inst.model.model_id
            inst.dirty = False
        return InstanceArrays(
            pos=jnp.asarray(pos),
            scale=jnp.asarray(scale),
            quat=jnp.asarray(quat),
            model_id=jnp.asarray(model_id),
        )

    def flush(self) -> InstanceArrays:
        """Upload pending changes; returns the current device SoA.

        Full rebuild on growth, scatter of packed dirty rows otherwise —
        reference: rebuildInstancesbuffer vs per-row staging writes.
        """
        if self._device is None or self._full_upload:
            self._device = self._build_full()
            self._full_upload = False
            self._dirty.clear()
            return self._device
        if self._dirty:
            n = len(self._dirty)
            batch = 1 << max(4, (n - 1).bit_length())  # tiered batch size
            if self._native is not None:
                # native dirty-row packing (C++ loop instead of python)
                nd = self._native.dirty_count
                batch = 1 << max(4, (max(nd, 1) - 1).bit_length())
                cnt, idx, pos, scale, quat, model_id = self._native.pack(batch)
                idx[cnt:] = 2**31 - 1  # padding -> dropped by scatter
                for i in self._dirty:
                    if i < len(self.instances):
                        self.instances[i].dirty = False
            else:
                idx = np.full((batch,), 2**31 - 1, np.int32)  # OOB -> dropped
                pos = np.zeros((batch, 3), np.float32)
                scale = np.ones((batch, 3), np.float32)
                quat = np.tile(np.asarray([1, 0, 0, 0], np.float32), (batch, 1))
                model_id = np.full((batch,), -1, np.int32)
                for j, i in enumerate(sorted(self._dirty)):
                    idx[j] = i
                    if i < len(self.instances):
                        inst = self.instances[i]
                        pos[j] = inst.position
                        scale[j] = inst.scale
                        quat[j] = inst.rotation
                        model_id[j] = inst.model.model_id
                        inst.dirty = False
            self._device = _scatter_rows(
                self._device,
                jnp.asarray(idx),
                jnp.asarray(pos),
                jnp.asarray(scale),
                jnp.asarray(quat),
                jnp.asarray(model_id),
            )
            self._dirty.clear()
        return self._device
