"""Models and model instances.

Reference parity: ``Model`` packs per-LOD, per-material-slot meshes into shared
geometry storage and serializes a shader-data blob of offsets
(src/PaperRenderer/Model.cpp:237-341, createShaderData :178-228).
``ModelInstance`` is a mutable TRS transform + optional unique animated
geometry copy (Model.cpp:398-404) + per-render-pass material bindings.

TPU-native differences:
  * the BDA pointer blob becomes dense int32 tables (see scene.SceneTables);
  * the optional BLAS is replaced by the implicit Morton BVH built over the
    packed triangle range (ops/bvh.py), built lazily by the ray-trace path;
  * "unique geometry" for animation is a second mesh range in the arena that
    an animation kernel writes each frame.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .geometry import GeometryArena, MeshHandle


@dataclasses.dataclass(frozen=True)
class MaterialMesh:
    """One mesh bound to a material slot inside an LOD
    (reference ``MaterialMeshInfo``, Model.h:59-66)."""

    handle: MeshHandle
    material_slot: int
    opaque: bool = True  # reference: affects BLAS any-hit flags (AccelerationStructure.cpp:335-377)


@dataclasses.dataclass(frozen=True)
class ModelLOD:
    meshes: Tuple[MaterialMesh, ...]


class Model:
    """Immutable LOD'd geometry owned by the engine (reference Model.h:130-157)."""

    def __init__(
        self,
        arena: GeometryArena,
        lods: Sequence[Sequence[MaterialMesh]],
        name: str = "model",
        aabb: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ):
        if not lods or not lods[0]:
            raise ValueError("Model needs at least one LOD with one mesh")
        self.name = name
        self.arena = arena
        self.lods: Tuple[ModelLOD, ...] = tuple(ModelLOD(tuple(l)) for l in lods)
        if aabb is None:
            mins, maxs = [], []
            for mm in self.lods[0].meshes:
                lo, hi = arena.mesh_aabb(mm.handle)
                mins.append(lo)
                maxs.append(hi)
            aabb = (np.min(mins, axis=0), np.max(maxs, axis=0))
        self.aabb_min = np.asarray(aabb[0], np.float32)
        self.aabb_max = np.asarray(aabb[1], np.float32)
        self.model_id: int = -1  # assigned by Scene.register_model
        # material slots used across all LODs (slot -> default material id 0)
        self.num_slots = 1 + max(
            mm.material_slot for lod in self.lods for mm in lod.meshes
        )

    @classmethod
    def from_mesh(
        cls,
        arena: GeometryArena,
        positions: np.ndarray,
        indices: np.ndarray,
        normals: Optional[np.ndarray] = None,
        uvs: Optional[np.ndarray] = None,
        name: str = "model",
        material_slot: int = 0,
    ) -> "Model":
        h = arena.add_mesh(positions, indices, normals, uvs)
        return cls(arena, [[MaterialMesh(h, material_slot)]], name=name)

    @property
    def lod_count(self) -> int:
        return len(self.lods)


class ModelInstance:
    """Mutable TRS instance of a Model (reference Model.h:177-235).

    Transform setters mark the instance dirty; the Scene collects dirty
    indices each frame and stages only those rows to the device — the analogue
    of queueModelsAndInstancesTransfers (PaperRenderer.cpp:308-363).
    """

    __slots__ = (
        "model", "index", "_pos", "_scale", "_quat",
        "dirty", "unique_geometry", "visible", "_scene", "anim_phase",
    )

    def __init__(self, model: Model, unique_geometry: bool = False,
                 anim_phase: float = 0.0):
        self.model = model
        self.index: int = -1  # slot in the Scene's instance SoA
        self._pos = np.zeros(3, np.float32)
        self._scale = np.ones(3, np.float32)
        self._quat = np.asarray([1.0, 0.0, 0.0, 0.0], np.float32)
        self.dirty = True
        self.visible = True
        self.unique_geometry = unique_geometry
        # per-instance animation phase for the unique-geometry path (the
        # reference passes per-instance push constants to BasicAnimation.comp)
        self.anim_phase = anim_phase
        self._scene = None

    # -- transform API (reference setTransformation, Model.cpp:567-571) -----
    def set_transform(self, pos=None, scale=None, quat=None) -> None:
        if pos is not None:
            self._pos = np.asarray(pos, np.float32)
        if scale is not None:
            s = np.asarray(scale, np.float32)
            self._scale = np.full(3, s, np.float32) if s.ndim == 0 else s
        if quat is not None:
            self._quat = np.asarray(quat, np.float32)
        self.dirty = True
        if self._scene is not None:
            self._scene.mark_instance_dirty(self)

    @property
    def position(self) -> np.ndarray:
        return self._pos

    @property
    def scale(self) -> np.ndarray:
        return self._scale

    @property
    def rotation(self) -> np.ndarray:
        return self._quat
