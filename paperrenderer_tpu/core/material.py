"""Materials: parameter tables + shading model selection.

The reference's ``Material`` is a raster pipeline + a user bind lambda, and
``MaterialInstance`` binds per-instance parameters via dynamic-offset UBOs
(src/PaperRenderer/Material.h:11-53, example/src/Materials.cpp). On TPU there
are no pipelines to bind: a material is a row in a device-side SoA *parameter
table* plus a shading-model id the fragment/hit kernels switch on. The SBT
hit-group machinery (Pipeline.cpp:497-529) collapses into the same table —
``shading_model`` plays the role of the hit-group record.

Parameters mirror the example app's PBR material definition
(example/src/Materials.h: albedo, emissive, roughness, metallic) plus alpha /
translucency for the sorted path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Shading models (the RT "hit group" / raster pipeline analogue).
SHADE_PBR = 0        # opaque Cook-Torrance PBR (example Default.frag / raytrace.rchit)
SHADE_LEAF = 1       # alpha-cutout PBR (example leaf.frag / leaf.rahit)
SHADE_EMISSIVE = 2   # pure emissive
SHADE_TRANSLUCENT = 3  # sorted back-to-front blended (RenderPass sorted path)

# Raster cull modes (the pipeline's rasterization state,
# src/PaperRenderer/Pipeline.h:80: default VK_CULL_MODE_BACK_BIT with
# VK_FRONT_FACE_CLOCKWISE; the example's foliage opts out with CULL_NONE,
# example/src/main.cpp:543).
CULL_NONE = 0
CULL_BACK = 1

_N_PARAMS = 12  # albedo(3) emissive(3) roughness metallic alpha shading_model pad(2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialTable:
    """Device SoA of material-instance parameters, indexed by material id."""

    albedo: jax.Array        # f32[M, 3]
    emissive: jax.Array      # f32[M, 3]
    roughness: jax.Array     # f32[M]
    metallic: jax.Array      # f32[M]
    alpha: jax.Array         # f32[M]
    shading_model: jax.Array  # i32[M]
    cull_back: jax.Array     # bool[M] — raster back-face culling (CULL_BACK)
    base_tex: jax.Array      # i32[M] — atlas texture id, -1 = untextured
    emissive_tex: jax.Array  # i32[M]
    mr_tex: jax.Array        # i32[M] — metallicRoughness (linear; g=rough, b=metal)
    occ_tex: jax.Array       # i32[M] — occlusion (linear; r channel)


class Material:
    """Host-side material definition (reference ``Material``, Material.h:11-44)."""

    def __init__(
        self,
        name: str = "material",
        *,
        albedo=(1.0, 1.0, 1.0),
        emissive=(0.0, 0.0, 0.0),
        roughness: float = 0.5,
        metallic: float = 0.0,
        alpha: float = 1.0,
        shading_model: int = SHADE_PBR,
        cull_mode: Optional[int] = None,  # CULL_BACK/CULL_NONE; None = auto:
        #   BACK for opaque models (the reference pipeline default,
        #   Pipeline.h:80), NONE for leaf/translucent (main.cpp:543 —
        #   foliage and blended geometry render double-sided)
        base_texture=None,       # u8/f32 [H, W, C] image (sRGB) or None
        emissive_texture=None,
        mr_texture=None,         # linear metallicRoughness (glTF: g=rough, b=metal)
        occlusion_texture=None,  # linear occlusion (glTF: r channel)
    ):
        self.name = name
        self.albedo = tuple(albedo)
        self.emissive = tuple(emissive)
        self.roughness = float(roughness)
        self.metallic = float(metallic)
        self.alpha = float(alpha)
        self.shading_model = int(shading_model)
        self.cull_mode = cull_mode if cull_mode is None else int(cull_mode)
        self.base_texture = base_texture
        self.emissive_texture = emissive_texture
        self.mr_texture = mr_texture
        self.occlusion_texture = occlusion_texture

    def instance(self, **overrides) -> "MaterialInstance":
        return MaterialInstance(self, **overrides)


class MaterialInstance:
    """Per-instance parameter override (reference ``MaterialInstance``)."""

    def __init__(self, base: Material, **overrides):
        self.base = base
        self.overrides = overrides

    def resolved(self) -> Dict:
        vals = dict(
            albedo=self.base.albedo,
            emissive=self.base.emissive,
            roughness=self.base.roughness,
            metallic=self.base.metallic,
            alpha=self.base.alpha,
            shading_model=self.base.shading_model,
            cull_mode=self.base.cull_mode,
            base_texture=self.base.base_texture,
            emissive_texture=self.base.emissive_texture,
            mr_texture=self.base.mr_texture,
            occlusion_texture=self.base.occlusion_texture,
        )
        vals.update(self.overrides)
        return vals


class MaterialRegistry:
    """Assigns dense ids to (Material|MaterialInstance) and builds the table.

    Replaces descriptor-set binding: render kernels index the table by the
    per-mesh material id resolved at preprocess time.
    """

    def __init__(self):
        self._rows = []
        self._ids: Dict[int, int] = {}  # id(obj) -> row
        # Hold references: ids are memory addresses, so registered objects
        # must stay alive or a GC'd temporary's address can be reused and
        # silently dedup a *different* material.
        self._objects = []
        # texture atlas shared by all materials (reference: Image instances
        # bound through combined samplers — VulkanResources.cpp:640-1003)
        from .texture import TextureAtlas

        self.textures = TextureAtlas()
        self._tex_ids: Dict[int, int] = {}   # id(image) -> atlas id
        self._tex_refs = []
        self.default = Material("default")
        self.register(self.default)

    def _texture_id(self, img, srgb: bool = True) -> int:
        if img is None:
            return -1
        key = (id(img), srgb)
        if key not in self._tex_ids:
            self._tex_ids[key] = self.textures.add(img, srgb=srgb)
            self._tex_refs.append(img)
        return self._tex_ids[key]

    def register(self, mat) -> int:
        key = id(mat)
        if key in self._ids:
            return self._ids[key]
        vals = mat.resolved() if isinstance(mat, MaterialInstance) else Material.instance(mat).resolved()
        row = len(self._rows)
        self._rows.append(vals)
        self._ids[key] = row
        self._objects.append(mat)
        return row

    def update(self, mat) -> None:
        """Re-read a registered material's parameters (live material editing,
        like the example GUI's material sliders)."""
        key = id(mat)
        if key not in self._ids:
            raise KeyError("material not registered")
        vals = mat.resolved() if isinstance(mat, MaterialInstance) else Material.instance(mat).resolved()
        self._rows[self._ids[key]] = vals

    def __len__(self) -> int:
        return len(self._rows)

    def objects(self) -> list:
        """Registered Material/MaterialInstance objects in id order (the
        GUI's editable-material listing, example GuiRender.cpp:65-77)."""
        return list(self._objects)

    def rows(self) -> list:
        """Resolved parameter dicts in id order (read-only snapshot)."""
        return [dict(v) for v in self._rows]

    @property
    def has_leaf(self) -> bool:
        return any(v["shading_model"] == SHADE_LEAF for v in self._rows)

    @property
    def has_textures(self) -> bool:
        return self.textures.count > 0

    def texture_arrays(self):
        """Device atlas view (None when no material is textured)."""
        if self.textures.count == 0:
            return None
        return self.textures.device_arrays()

    def table(self) -> MaterialTable:
        n = max(1, len(self._rows))
        albedo = np.ones((n, 3), np.float32)
        emissive = np.zeros((n, 3), np.float32)
        roughness = np.full((n,), 0.5, np.float32)
        metallic = np.zeros((n,), np.float32)
        alpha = np.ones((n,), np.float32)
        shading = np.zeros((n,), np.int32)
        cull_back = np.zeros((n,), bool)
        base_tex = np.full((n,), -1, np.int32)
        emissive_tex = np.full((n,), -1, np.int32)
        mr_tex = np.full((n,), -1, np.int32)
        occ_tex = np.full((n,), -1, np.int32)
        for i, vals in enumerate(self._rows):
            albedo[i] = vals["albedo"]
            emissive[i] = vals["emissive"]
            roughness[i] = vals["roughness"]
            metallic[i] = vals["metallic"]
            alpha[i] = vals["alpha"]
            shading[i] = vals["shading_model"]
            cm = vals.get("cull_mode")
            if cm is None:
                # auto: the reference defaults every pipeline to BACK
                # (Pipeline.h:80) and double-sides foliage/blends explicitly
                cm = (CULL_NONE
                      if vals["shading_model"] in (SHADE_LEAF,
                                                   SHADE_TRANSLUCENT)
                      else CULL_BACK)
            cull_back[i] = cm == CULL_BACK
            base_tex[i] = self._texture_id(vals.get("base_texture"))
            emissive_tex[i] = self._texture_id(vals.get("emissive_texture"))
            mr_tex[i] = self._texture_id(vals.get("mr_texture"), srgb=False)
            occ_tex[i] = self._texture_id(
                vals.get("occlusion_texture"), srgb=False)
        return MaterialTable(
            albedo=jnp.asarray(albedo),
            emissive=jnp.asarray(emissive),
            roughness=jnp.asarray(roughness),
            metallic=jnp.asarray(metallic),
            alpha=jnp.asarray(alpha),
            shading_model=jnp.asarray(shading),
            cull_back=jnp.asarray(cull_back),
            base_tex=jnp.asarray(base_tex),
            emissive_tex=jnp.asarray(emissive_tex),
            mr_tex=jnp.asarray(mr_tex),
            occ_tex=jnp.asarray(occ_tex),
        )
