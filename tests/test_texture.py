"""Texture atlas + sampling tests.

Covers the reference Image subsystem's capability surface
(src/PaperRenderer/VulkanResources.cpp:640-1003 — staged upload, mip chain,
sampler) in its TPU redesign: a packed pair-texel atlas sampled by row
gathers, sRGB linearization at upload, mip selection by explicit lod.
"""

import io
import json
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.core import (
    Camera, GeometryArena, Material, MaterialRegistry, Scene,
)
from paperrenderer_tpu.ops.shading import Lights
from paperrenderer_tpu.core.geometry import make_plane
from paperrenderer_tpu.core.model import Model, ModelInstance
from paperrenderer_tpu.core.texture import (
    MAX_MIPS, TextureAtlas, sample_bilinear,
)
from paperrenderer_tpu.render import RayTraceRender, RenderPass


def _sample(atlas, tid, u, v, lod=None):
    tex = atlas.device_arrays()
    uv = jnp.asarray([[u, v]], jnp.float32)
    t = jnp.asarray([tid], jnp.int32)
    lo = None if lod is None else jnp.asarray([lod], jnp.float32)
    return np.asarray(sample_bilinear(tex, t, uv, lo))[0]


def test_texel_center_exact():
    """Sampling at texel centers returns the stored texel exactly."""
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    img[0, 1] = (0, 255, 0)
    img[1, 0] = (0, 0, 255)
    img[1, 1] = (255, 255, 255)
    atlas = TextureAtlas(width=64)
    tid = atlas.add(img, srgb=False)
    np.testing.assert_allclose(_sample(atlas, tid, 0.25, 0.25)[:3], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(_sample(atlas, tid, 0.75, 0.25)[:3], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(_sample(atlas, tid, 0.25, 0.75)[:3], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(_sample(atlas, tid, 0.75, 0.75)[:3], [1, 1, 1], atol=1e-6)


def test_bilinear_midpoint_and_wrap():
    img = np.zeros((1, 2, 3), np.uint8)
    img[0, 0] = (0, 0, 0)
    img[0, 1] = (255, 255, 255)
    atlas = TextureAtlas(width=64)
    tid = atlas.add(img, srgb=False)
    # midpoint between the two texels = 0.5
    mid = _sample(atlas, tid, 0.5, 0.5)
    np.testing.assert_allclose(mid[:3], [0.5, 0.5, 0.5], atol=1 / 255)
    # repeat wrap: u = 1.25 == u = 0.25
    np.testing.assert_allclose(
        _sample(atlas, tid, 1.25, 0.5), _sample(atlas, tid, 0.25, 0.5), atol=1e-6
    )


def test_one_by_one_texture_no_atlas_bleed():
    """A 1x1 texture must not blend with its atlas shelf neighbor."""
    atlas = TextureAtlas(width=64)
    a = atlas.add(np.full((1, 1, 3), 200, np.uint8), srgb=False)
    atlas.add(np.zeros((4, 4, 3), np.uint8), srgb=False)  # neighbor
    for u in (0.05, 0.5, 0.95):
        np.testing.assert_allclose(
            _sample(atlas, a, u, 0.5)[:3], [200 / 255] * 3, atol=1e-6
        )


def test_mip_chain_lod_selection():
    """lod selects box-filtered mips; the last mip is the image mean."""
    img = np.zeros((4, 4, 3), np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255  # checker: mean 127.5
    atlas = TextureAtlas(width=64)
    tid = atlas.add(img, srgb=False)
    n_mips = int(np.asarray(atlas.device_arrays().mip_counts)[tid])
    assert n_mips == 3  # 4x4, 2x2, 1x1
    top = _sample(atlas, tid, 1 / 8, 1 / 8, lod=0.0)
    np.testing.assert_allclose(top[:3], [1, 1, 1], atol=1e-6)
    last = _sample(atlas, tid, 0.5, 0.5, lod=2.0)
    np.testing.assert_allclose(last[:3], [0.5, 0.5, 0.5], atol=2 / 255)
    # lod beyond the chain clamps to the last mip
    np.testing.assert_allclose(
        _sample(atlas, tid, 0.5, 0.5, lod=float(MAX_MIPS)), last, atol=1e-6
    )


def test_srgb_linearization():
    """sRGB 188 -> linear ~0.5 (the reference's *_SRGB view conversion)."""
    atlas = TextureAtlas(width=16)
    tid = atlas.add(np.full((1, 1, 3), 188, np.uint8), srgb=True)
    v = _sample(atlas, tid, 0.5, 0.5)[0]
    assert abs(v - 0.502) < 0.01


def test_negative_id_samples_white():
    atlas = TextureAtlas(width=16)
    atlas.add(np.zeros((2, 2, 3), np.uint8))
    np.testing.assert_allclose(_sample(atlas, -1, 0.3, 0.3), [1, 1, 1, 1])


def _checker(n=8, c0=(0, 0, 0), c1=(255, 255, 255)):
    img = np.zeros((n, n, 3), np.uint8)
    img[...] = c0
    ii, jj = np.meshgrid(range(n), range(n), indexing="ij")
    img[(ii // (n // 2) + jj // (n // 2)) % 2 == 1] = c1
    return img


def _textured_plane_scene(tex_img):
    scene = Scene()
    registry = MaterialRegistry()
    plane = Model.from_mesh(scene.arena, *make_plane(size=2.0), name="plane")
    mat = Material("textured", albedo=(1, 1, 1), roughness=1.0,
                   base_texture=tex_img)
    return scene, registry, plane, mat


def test_raster_textured_render():
    """A checker baseColor texture shows distinct quadrants in raster."""
    # red / green checker so quadrants are distinguishable channels
    img = _checker(8, c0=(255, 0, 0), c1=(0, 255, 0))
    scene, registry, plane, mat = _textured_plane_scene(img)
    rp = RenderPass(scene, registry, width=32, height=32,
                    lights=Lights.make([], ambient=(1, 1, 1, 1.0)))
    inst = ModelInstance(plane)
    rp.add_instance(inst, {0: mat.instance()})
    cam = Camera(yfov_deg=45.0, aspect=1.0, near=0.1, far=50.0)
    cam.look_at((0.0, 0.0, 2.5), (0.0, 0.0, 0.0), up=(0, 1, 0))
    ldr, aux = rp.render(cam)
    img_out = np.asarray(ldr)
    assert float(aux["coverage"]) > 0.5
    # sample interior points of opposing quadrants
    a = img_out[8, 8]     # one checker color
    b = img_out[8, 24]    # the other
    assert abs(float(a[0]) - float(b[0])) > 0.2  # red differs across quadrants
    assert abs(float(a[1]) - float(b[1])) > 0.2


def test_rt_textured_render():
    """The same checker texture shows through the ray-traced path."""
    img = _checker(8, c0=(255, 0, 0), c1=(0, 255, 0))
    scene, registry, plane, mat = _textured_plane_scene(img)
    rt = RayTraceRender(scene, registry, width=32, height=32,
                        lights=Lights.make([], ambient=(1, 1, 1, 1.0)),
                        shadow_samples=0, reflection_samples=0, ao_samples=0)
    inst = ModelInstance(plane)
    rt.add_instance(inst, {0: mat.instance()})
    cam = Camera(yfov_deg=45.0, aspect=1.0, near=0.1, far=50.0)
    cam.look_at((0.0, 0.0, 2.5), (0.0, 0.0, 0.0), up=(0, 1, 0))
    ldr, aux = rt.render(cam)
    img_out = np.asarray(ldr)
    a = img_out[8, 8]
    b = img_out[8, 24]
    assert abs(float(a[0]) - float(b[0])) > 0.2
    assert abs(float(a[1]) - float(b[1])) > 0.2


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    return buf.getvalue()


def _make_textured_glb(path):
    """One textured quad (POSITION/NORMAL/TEXCOORD_0) with an embedded PNG."""
    positions = np.asarray(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.asarray([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    indices = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    png = _png_bytes(_checker(8, c0=(255, 0, 0), c1=(0, 255, 0)))

    bin_parts = [positions.tobytes(), normals.tobytes(), uvs.tobytes(),
                 indices.tobytes(), png]
    offsets, off = [], 0
    for part in bin_parts:
        offsets.append(off)
        off += len(part) + (-len(part) % 4)
    binary = b"".join(p + b"\x00" * (-len(p) % 4) for p in bin_parts)

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3,
            "material": 0,
        }]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1],
                "baseColorTexture": {"index": 0},
                "roughnessFactor": 1.0,
                "metallicFactor": 0.0,
            },
        }],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 4, "mimeType": "image/png"}],
        "buffers": [{"byteLength": len(binary)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 32},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": 12},
            {"buffer": 0, "byteOffset": offsets[4], "byteLength": len(png)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
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


def test_textured_glb_loads_and_renders(tmp_path):
    from paperrenderer_tpu.io.gltf import instantiate, load_gltf

    path = str(tmp_path / "textured.glb")
    _make_textured_glb(path)
    scene = Scene()
    registry = MaterialRegistry()
    gs = load_gltf(path, scene.arena)
    assert gs.materials[0].base_texture is not None
    assert gs.materials[0].base_texture.shape[:2] == (8, 8)
    rp = RenderPass(scene, registry, width=32, height=32,
                    lights=Lights.make([], ambient=(1, 1, 1, 1.0)))
    instantiate(gs, rp)
    cam = Camera(yfov_deg=45.0, aspect=1.0, near=0.1, far=50.0)
    cam.look_at((0.0, 0.0, 2.5), (0.0, 0.0, 0.0), up=(0, 1, 0))
    ldr, aux = rp.render(cam)
    img_out = np.asarray(ldr)
    assert float(aux["coverage"]) > 0.5
    a, b = img_out[8, 8], img_out[8, 24]
    assert abs(float(a[0]) - float(b[0])) > 0.2
    assert abs(float(a[1]) - float(b[1])) > 0.2


def test_metallic_roughness_occlusion_textures():
    """glTF metallicRoughness (g=rough, b=metal) and occlusion (r) maps
    modulate the parameter factors; linear (non-sRGB) sampling."""
    # mr map: left half rough (g=255, b=0), right half smooth metal (g=0, b=255)
    mr = np.zeros((8, 8, 3), np.uint8)
    mr[:, :4, 1] = 255
    mr[:, 4:, 2] = 255
    # occlusion: left dark (0), right lit (255)
    occ = np.zeros((8, 8, 3), np.uint8)
    occ[:, 4:] = 255

    scene = Scene()
    registry = MaterialRegistry()
    plane = Model.from_mesh(scene.arena, *make_plane(size=2.0), name="plane")
    mat = Material("mr", albedo=(1, 1, 1), roughness=1.0, metallic=1.0,
                   mr_texture=mr, occlusion_texture=occ)
    rp = RenderPass(scene, registry, width=32, height=32,
                    lights=Lights.make([], ambient=(1, 1, 1, 1.0)))
    rp.add_instance(ModelInstance(plane), {0: mat.instance()})
    cam = Camera(yfov_deg=45.0, aspect=1.0, near=0.1, far=50.0)
    cam.look_at((0.0, 0.0, 2.5), (0.0, 0.0, 0.0), up=(0, 1, 0))
    ldr, aux = rp.render(cam)
    img = np.asarray(ldr)
    left, right = img[16, 8], img[16, 24]
    # left: non-metal (ambient * albedo scaled by occ=0) -> dark
    # right: metallic (ambient reduced by metal kd, occ=1) but some ambient
    assert float(left.max()) < float(right.max())
    # occlusion really zeroed the left ambient
    assert float(left.max()) < 0.08


def test_textured_material_table_ids():
    """mr/occlusion textures get distinct linear atlas entries."""
    img = np.zeros((4, 4, 3), np.uint8)
    registry = MaterialRegistry()
    m = Material("x", base_texture=img, mr_texture=img)
    registry.register(m)
    table = registry.table()
    row = registry._ids[id(m)]
    # same image registered twice: once sRGB (base), once linear (mr)
    assert int(np.asarray(table.base_tex)[row]) != int(np.asarray(table.mr_tex)[row])
    assert registry.textures.count == 2


def test_trilinear_blends_adjacent_mips():
    """sample_trilinear at fractional lod is the lerp of the two adjacent
    bilinear mip taps, continuous across the mip boundary — the nearest-mip
    path's banding discontinuity (reference samplers use
    VK_SAMPLER_MIPMAP_MODE_LINEAR, VulkanResources.cpp:787-794)."""
    from paperrenderer_tpu.core.texture import sample_trilinear

    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = 255                      # top half white: mips differ
    atlas = TextureAtlas(width=64)
    tid = atlas.add(img, srgb=False)
    tex = atlas.device_arrays()
    t = jnp.asarray([tid], jnp.int32)
    uv = jnp.asarray([[0.3, 0.3]], jnp.float32)

    def tri(lod):
        return np.asarray(sample_trilinear(
            tex, t, uv, jnp.asarray([lod], jnp.float32)))[0]

    def bil(lod):
        return np.asarray(sample_bilinear(
            tex, t, uv, jnp.asarray([lod], jnp.float32)))[0]

    # integral lods match the bilinear taps exactly
    np.testing.assert_allclose(tri(0.0), bil(0.0), atol=1e-6)
    np.testing.assert_allclose(tri(1.0), bil(1.0), atol=1e-6)
    # fractional lod = exact lerp
    np.testing.assert_allclose(
        tri(0.25), 0.75 * bil(0.0) + 0.25 * bil(1.0), atol=1e-6)
    # continuity at the boundary (the banding test): approaching lod 1 from
    # below converges to the lod-1 tap instead of jumping at the switch
    np.testing.assert_allclose(tri(1.0 - 1e-3), tri(1.0), atol=2e-3)


def test_aniso2_matches_two_trilinear_taps():
    """sample_aniso2 = mean of two trilinear taps offset +-duv/4 at the
    minor-axis lod; uv_screen_lod_aniso keeps the minor lod sharper than
    the isotropic lod on oblique footprints."""
    from paperrenderer_tpu.core.texture import (
        sample_aniso2, sample_trilinear, uv_screen_lod, uv_screen_lod_aniso,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    atlas = TextureAtlas(width=64)
    tid = atlas.add(img, srgb=False)
    tex = atlas.device_arrays()

    # oblique footprint: uv stretches 4x faster along screen x than y
    h = w = 8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    uv_img = jnp.asarray(np.stack([xx * 0.25, yy * 0.0625], axis=-1))
    rw = jnp.full((h, w), 16.0)
    rh = jnp.full((h, w), 16.0)
    lod_iso = uv_screen_lod(uv_img, rw, rh)
    lod, duv = uv_screen_lod_aniso(uv_img, rw, rh, max_aniso=2.0)
    assert float(lod[0, 0]) < float(lod_iso[0, 0])  # sharper along major
    # capped at max_aniso: minor >= major/2
    assert float(lod[0, 0]) >= float(lod_iso[0, 0]) - 1.0 - 1e-5

    t = jnp.full((h, w), tid, jnp.int32)
    got = np.asarray(sample_aniso2(tex, t, uv_img, lod, duv))
    want = 0.5 * (
        np.asarray(sample_trilinear(tex, t, uv_img - duv * 0.25, lod))
        + np.asarray(sample_trilinear(tex, t, uv_img + duv * 0.25, lod)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_shade_gbuffer_mip_filter_modes():
    """The deferred shader accepts all three mip_filter modes and they
    agree where lod is integral (flat screen-aligned footprints)."""
    from examples.render_textured import build_textured_scene
    from paperrenderer_tpu.ops.shading import shade_gbuffer

    _, _, rp, cam = build_textured_scene(64, 64)
    # render once to warm caches and grab the internal pieces
    ldr, aux = rp.render(cam)
    assert np.isfinite(np.asarray(ldr)).all()
