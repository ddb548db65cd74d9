"""Minimal glTF 2.0 loader (.glb / .gltf) -> Models + instances.

The reference example app loads .glb scenes with tinygltf
(example/src/main.cpp:28-200): meshes become Models (one LOD, one material
slot per primitive), nodes with transforms become instances, and
pbrMetallicRoughness factors become material parameters. This loader covers
the same surface with no external dependencies (json + struct + numpy):

  * GLB container (JSON + BIN chunks) and .gltf with external/base64 buffers
  * accessors: POSITION / NORMAL / TEXCOORD_0 + indices
    (f32 / u8 / u16 / u32 components, non-sparse)
  * materials: baseColorFactor, metallicFactor, roughnessFactor,
    emissiveFactor, alphaMode BLEND -> SHADE_TRANSLUCENT
  * node hierarchy with TRS or matrix transforms (flattened to world TRS)

  * textures: baseColorTexture / emissiveTexture images (embedded
    bufferView, data: URI, or external file) are decoded and attached to the
    Material; the MaterialRegistry packs them into the shared device atlas
    (core/texture.py) when the material table is built.
"""

from __future__ import annotations

import base64
import json
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.geometry import GeometryArena
from ..core.material import Material, SHADE_PBR, SHADE_TRANSLUCENT
from ..core.model import MaterialMesh, Model

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_container(path: str) -> Tuple[dict, List[bytes]]:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] == b"glTF":
        # GLB: header (12B) then chunks
        _, _, _length = struct.unpack("<4sII", data[:12])
        offset = 12
        gltf = None
        binary = b""
        while offset < len(data):
            clen, ctype = struct.unpack_from("<I4s", data, offset)
            chunk = data[offset + 8 : offset + 8 + clen]
            if ctype == b"JSON":
                gltf = json.loads(chunk.decode("utf-8"))
            elif ctype == b"BIN\x00":
                binary = chunk
            offset += 8 + clen + (-clen % 4 if ctype == b"JSON" else 0)
        assert gltf is not None, "GLB missing JSON chunk"
        buffers = [binary]
    else:
        gltf = json.loads(data.decode("utf-8"))
        buffers = []
        base = os.path.dirname(os.path.abspath(path))
        for buf in gltf.get("buffers", []):
            uri = buf.get("uri", "")
            if uri.startswith("data:"):
                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                with open(os.path.join(base, uri), "rb") as bf:
                    buffers.append(bf.read())
    return gltf, buffers


def _read_accessor(gltf: dict, buffers: List[bytes], idx: int) -> np.ndarray:
    acc = gltf["accessors"][idx]
    assert "sparse" not in acc, "sparse accessors not supported"
    view = gltf["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    buf = buffers[view.get("buffer", 0)]
    start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride", 0)
    itemsize = np.dtype(dtype).itemsize * ncomp
    if stride and stride != itemsize:
        rows = []
        for i in range(count):
            o = start + i * stride
            rows.append(np.frombuffer(buf, dtype, ncomp, o))
        arr = np.stack(rows)
    else:
        arr = np.frombuffer(buf, dtype, count * ncomp, start).reshape(count, ncomp)
    return arr.copy()


def _node_trs(node: dict) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Node transform -> (pos, scale, quat wxyz)."""
    if "matrix" in node:
        m = np.asarray(node["matrix"], np.float32).reshape(4, 4).T  # column-major
        pos = m[:3, 3].copy()
        a = m[:3, :3]
        scale = np.linalg.norm(a, axis=0)
        r = a / np.maximum(scale, 1e-12)
        # rotation matrix -> quaternion (wxyz)
        t = np.trace(r)
        if t > 0:
            s = np.sqrt(t + 1.0) * 2
            quat = np.asarray([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                               (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
        else:
            i = int(np.argmax(np.diag(r)))
            j, k = (i + 1) % 3, (i + 2) % 3
            s = np.sqrt(max(r[i, i] - r[j, j] - r[k, k] + 1.0, 1e-12)) * 2
            q = np.zeros(4)
            q[1 + i] = 0.25 * s
            q[0] = (r[k, j] - r[j, k]) / s
            q[1 + j] = (r[j, i] + r[i, j]) / s
            q[1 + k] = (r[k, i] + r[i, k]) / s
            quat = q
        return pos.astype(np.float32), scale.astype(np.float32), quat.astype(np.float32)
    pos = np.asarray(node.get("translation", [0, 0, 0]), np.float32)
    scale = np.asarray(node.get("scale", [1, 1, 1]), np.float32)
    q_xyzw = np.asarray(node.get("rotation", [0, 0, 0, 1]), np.float32)
    quat = np.asarray([q_xyzw[3], q_xyzw[0], q_xyzw[1], q_xyzw[2]], np.float32)
    return pos, scale, quat


class GltfScene:
    """Loaded scene: models, per-model material lists, node instances."""

    def __init__(self):
        self.models: List[Model] = []
        self.materials: List[Material] = []           # by gltf material index
        self.model_slot_materials: List[Dict[int, Material]] = []
        self.instances: List[Tuple[int, np.ndarray, np.ndarray, np.ndarray]] = []
        # ^ (model index, pos, scale, quat)


def _texture_image(gltf: dict, buffers: List[bytes], base_dir: str,
                   cache: Dict[int, Optional[np.ndarray]],
                   tex_ref: Optional[dict]) -> Optional[np.ndarray]:
    """Resolve a glTF textureInfo -> decoded u8 image (None if absent)."""
    if tex_ref is None:
        return None
    tex = gltf.get("textures", [])[tex_ref["index"]]
    src = tex.get("source")
    if src is None:
        return None
    if src in cache:
        return cache[src]
    img_def = gltf["images"][src]
    from .image import read_image

    if "bufferView" in img_def:
        view = gltf["bufferViews"][img_def["bufferView"]]
        buf = buffers[view.get("buffer", 0)]
        start = view.get("byteOffset", 0)
        data = buf[start : start + view["byteLength"]]
        img = read_image(data)
    else:
        uri = img_def.get("uri", "")
        if uri.startswith("data:"):
            img = read_image(base64.b64decode(uri.split(",", 1)[1]))
        else:
            img = read_image(os.path.join(base_dir, uri))
    cache[src] = img
    return img


def load_gltf(path: str, arena: GeometryArena) -> GltfScene:
    """Parse a .glb/.gltf file into arena-backed Models + instance TRS list."""
    gltf, buffers = _load_container(path)
    out = GltfScene()
    base_dir = os.path.dirname(os.path.abspath(path))
    img_cache: Dict[int, Optional[np.ndarray]] = {}

    for mi, mat in enumerate(gltf.get("materials", [])):
        pbr = mat.get("pbrMetallicRoughness", {})
        base = pbr.get("baseColorFactor", [1, 1, 1, 1])
        emissive = mat.get("emissiveFactor", [0, 0, 0])
        blend = mat.get("alphaMode", "OPAQUE") == "BLEND"
        base_img = _texture_image(gltf, buffers, base_dir, img_cache,
                                  pbr.get("baseColorTexture"))
        emis_img = _texture_image(gltf, buffers, base_dir, img_cache,
                                  mat.get("emissiveTexture"))
        mr_img = _texture_image(gltf, buffers, base_dir, img_cache,
                                pbr.get("metallicRoughnessTexture"))
        occ_img = _texture_image(gltf, buffers, base_dir, img_cache,
                                 mat.get("occlusionTexture"))
        out.materials.append(
            Material(
                mat.get("name", f"material{mi}"),
                albedo=tuple(base[:3]),
                alpha=float(base[3]),
                roughness=float(pbr.get("roughnessFactor", 1.0)),
                metallic=float(pbr.get("metallicFactor", 1.0)),
                emissive=tuple(emissive),
                shading_model=SHADE_TRANSLUCENT if blend else SHADE_PBR,
                base_texture=base_img,
                emissive_texture=emis_img,
                mr_texture=mr_img,
                occlusion_texture=occ_img,
            )
        )
    default_mat = Material("gltf-default")

    for mesh_i, mesh in enumerate(gltf.get("meshes", [])):
        meshes: List[MaterialMesh] = []
        slot_mats: Dict[int, Material] = {}
        for slot, prim in enumerate(mesh.get("primitives", [])):
            attrs = prim["attributes"]
            pos = _read_accessor(gltf, buffers, attrs["POSITION"]).astype(np.float32)
            nrm = (
                _read_accessor(gltf, buffers, attrs["NORMAL"]).astype(np.float32)
                if "NORMAL" in attrs else None
            )
            uv = (
                _read_accessor(gltf, buffers, attrs["TEXCOORD_0"]).astype(np.float32)
                if "TEXCOORD_0" in attrs else None
            )
            if "indices" in prim:
                idx = _read_accessor(gltf, buffers, prim["indices"]).reshape(-1)
            else:
                idx = np.arange(pos.shape[0], dtype=np.int64)
            idx = idx.astype(np.int64).reshape(-1, 3)
            handle = arena.add_mesh(pos, idx, nrm, uv)
            meshes.append(MaterialMesh(handle, material_slot=slot))
            mat_idx = prim.get("material")
            slot_mats[slot] = (
                out.materials[mat_idx] if mat_idx is not None else default_mat
            )
        if meshes:
            model = Model(arena, [meshes], name=mesh.get("name", f"mesh{mesh_i}"))
            out.models.append(model)
            out.model_slot_materials.append(slot_mats)
        else:
            out.models.append(None)
            out.model_slot_materials.append({})

    # flatten the node hierarchy to world TRS (uniform-scale composition)
    nodes = gltf.get("nodes", [])
    scene_idx = gltf.get("scene", 0)
    roots = gltf.get("scenes", [{}])[scene_idx].get("nodes", range(len(nodes)))

    from ..core.transforms import quat_multiply, quat_to_mat3

    import jax.numpy as jnp

    def walk(ni, parent_pos, parent_scale, parent_quat):
        node = nodes[ni]
        pos, scale, quat = _node_trs(node)
        # compose: world = parent ∘ local
        r_parent = np.asarray(quat_to_mat3(jnp.asarray(parent_quat)))
        w_pos = parent_pos + r_parent @ (parent_scale * pos)
        w_scale = parent_scale * scale
        w_quat = np.asarray(quat_multiply(jnp.asarray(parent_quat), jnp.asarray(quat)))
        if "mesh" in node and out.models[node["mesh"]] is not None:
            out.instances.append((node["mesh"], w_pos, w_scale, w_quat))
        for child in node.get("children", []):
            walk(child, w_pos, w_scale, w_quat)

    ident = (np.zeros(3, np.float32), np.ones(3, np.float32),
             np.asarray([1, 0, 0, 0], np.float32))
    for r in roots:
        walk(r, *ident)
    return out


def instantiate(gltf_scene: GltfScene, render_pass, scene=None):
    """Create ModelInstances in a RenderPass from a loaded glTF scene
    (the example app's model-creation loop, main.cpp:131-200)."""
    from ..core.model import ModelInstance

    created = []
    for model_i, pos, scale, quat in gltf_scene.instances:
        model = gltf_scene.models[model_i]
        inst = ModelInstance(model)
        inst.set_transform(pos=pos, scale=scale, quat=quat)
        mats = {
            slot: mat.instance()
            for slot, mat in gltf_scene.model_slot_materials[model_i].items()
        }
        render_pass.add_instance(inst, mats)
        created.append(inst)
    return created
