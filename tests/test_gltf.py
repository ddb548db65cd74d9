"""glTF loader tests: build a .glb in-memory, load it, render it."""

import base64
import json
import struct

import numpy as np
import pytest

from paperrenderer_tpu.core import Camera, GeometryArena, MaterialRegistry, Scene
from paperrenderer_tpu.io.gltf import instantiate, load_gltf
from paperrenderer_tpu.render import RenderPass


def _make_glb(path):
    """A .glb with one triangle-pair quad mesh, a red material, two nodes."""
    positions = np.asarray(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    indices = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)

    bin_parts = [positions.tobytes(), normals.tobytes(), indices.tobytes()]
    offsets = []
    off = 0
    for part in bin_parts:
        offsets.append(off)
        off += len(part)
        off += -off % 4
    binary = b"".join(
        part + b"\x00" * (-len(part) % 4) for part in bin_parts
    )

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "translation": [0, 0, 0]},
            {"mesh": 0, "translation": [3, 0, 0], "scale": [2, 2, 2],
             "rotation": [0, 0, 0.7071068, 0.7071068]},  # 90deg about z (xyzw)
        ],
        "meshes": [{
            "name": "quad",
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1},
                "indices": 2,
                "material": 0,
            }],
        }],
        "materials": [{
            "name": "red",
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.1, 0.1, 1.0],
                "roughnessFactor": 0.4,
                "metallicFactor": 0.0,
            },
            "emissiveFactor": [0.1, 0.0, 0.0],
        }],
        "buffers": [{"byteLength": len(binary)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }
    json_bytes = json.dumps(gltf).encode()
    json_bytes += b" " * (-len(json_bytes) % 4)
    total = 12 + 8 + len(json_bytes) + 8 + len(binary)
    with open(path, "wb") as f:
        f.write(struct.pack("<4sII", b"glTF", 2, total))
        f.write(struct.pack("<I4s", len(json_bytes), b"JSON"))
        f.write(json_bytes)
        f.write(struct.pack("<I4s", len(binary), b"BIN\x00"))
        f.write(binary)


def test_load_glb_geometry_and_materials(tmp_path):
    path = str(tmp_path / "quad.glb")
    _make_glb(path)
    arena = GeometryArena()
    gs = load_gltf(path, arena)
    assert len(gs.models) == 1
    model = gs.models[0]
    assert model.name == "quad"
    h = model.lods[0].meshes[0].handle
    assert h.vertex_count == 4 and h.tri_count == 2
    assert len(gs.materials) == 1
    m = gs.materials[0]
    assert m.albedo == pytest.approx((0.9, 0.1, 0.1))
    assert m.roughness == pytest.approx(0.4)
    assert m.emissive == pytest.approx((0.1, 0.0, 0.0))
    # two node instances with transforms
    assert len(gs.instances) == 2
    _, pos1, scale1, quat1 = gs.instances[1]
    np.testing.assert_allclose(pos1, [3, 0, 0])
    np.testing.assert_allclose(scale1, [2, 2, 2])
    # 90 deg about z in wxyz
    np.testing.assert_allclose(quat1, [0.7071068, 0, 0, 0.7071068], atol=1e-6)


def test_gltf_renders(tmp_path):
    path = str(tmp_path / "quad.glb")
    _make_glb(path)
    scene = Scene()
    registry = MaterialRegistry()
    gs = load_gltf(path, scene.arena)
    rp = RenderPass(scene, registry, width=32, height=32)
    instantiate(gs, rp)
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0), up=(0, 1, 0))
    ldr, aux = rp.render(cam)
    img = np.asarray(ldr)
    assert float(aux["coverage"]) > 0.05
    c = img[16, 16]
    assert c[0] > c[1] and c[0] > c[2]  # red material shows
