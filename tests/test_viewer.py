"""Viewer (present-loop + GUI analogue) tests.

Exercises the HTTP surface the reference exposes through its GLFW window +
ImGui panel (Swapchain.cpp:109-160 present; example GuiRender.cpp:62-118
material sliders / mode switch / statistics): frame streaming, live
material edits reaching the next rendered frame, camera moves, stats.
"""

import io
import json
import urllib.request

import numpy as np

from paperrenderer_tpu import (
    Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
    StatisticsTracker, Viewer, make_uv_sphere,
)
from paperrenderer_tpu.render import RenderPass


def _scene(width=48, height=48):
    scene = Scene()
    registry = MaterialRegistry()
    pos, idx, nrm, uv = make_uv_sphere(radius=1.0, rings=8, sectors=12)
    model = Model.from_mesh(scene.arena, pos, idx, nrm, uv)
    inst = ModelInstance(model)
    red = Material("red", albedo=(1.0, 0.1, 0.1), roughness=0.4)
    rp = RenderPass(scene, registry, width=width, height=height)
    rp.add_instance(inst, {0: red.instance()})
    cam = Camera(aspect=width / height)
    cam.look_at((0.0, -3.0, 0.0), (0.0, 0.0, 0.0))
    return rp, cam


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:   # 4xx still carries a JSON body
        return json.loads(e.read())


def test_viewer_end_to_end():
    stats = StatisticsTracker()
    rp, cam = _scene()
    v = Viewer({"raster": rp}, cam, statistics=stats).start()
    try:
        assert v.wait_frame(1, timeout=180.0)
        base = v.url

        # GUI page serves
        page = _get(base + "/").decode()
        assert "paperrenderer_tpu" in page

        # present: a decodable PNG of the right size with the red sphere
        from PIL import Image

        png = _get(base + "/frame.png")
        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape[:2] == (48, 48)
        c = img[24, 24]
        assert int(c[0]) > int(c[1]) and int(c[0]) > int(c[2])

        # stats endpoint
        s = json.loads(_get(base + "/stats"))
        assert s["frame"] >= 1 and s["mode"] == "raster"
        assert s["width"] == 48

        # materials listing (a default material may occupy id 0)
        mats = json.loads(_get(base + "/materials"))["materials"]
        red = [m for m in mats if m["name"] == "red"]
        assert len(red) == 1 and red[0]["albedo"] == [1.0, 0.1, 0.1]

        # live material edit: turn the sphere green, next frames change
        idx0 = v._frame_index
        _post(base + "/material",
              {"id": red[0]["id"], "updates": {"albedo": [0.1, 1.0, 0.1]}})
        assert v.wait_frame(idx0 + 2, timeout=180.0)
        png2 = _get(base + "/frame.png")
        img2 = np.asarray(Image.open(io.BytesIO(png2)))
        c2 = img2[24, 24]
        assert int(c2[1]) > int(c2[0])

        # bad edits rejected
        err = _post(base + "/material",
                    {"id": red[0]["id"], "updates": {"width": 1}})
        assert "error" in err

        # camera move changes the view
        _post(base + "/camera", {"pos": [0.0, -6.0, 0.0], "yaw": 0.0,
                                 "pitch": 0.0})
        idx1 = v._frame_index
        assert v.wait_frame(idx1 + 2, timeout=180.0)

        # mode endpoint lists and rejects unknown modes
        modes = json.loads(_get(base + "/modes"))
        assert modes == {"modes": ["raster"], "active": "raster"}
        err = _post(base + "/mode", {"mode": "nope"})
        assert "error" in err
    finally:
        v.stop()


def test_rt_adopts_renderpass_bindings():
    """RayTraceRender.add_instances_from mirrors a raster pass's instances
    + material bindings (the same-scene raster<->RT toggle of the example
    GUI, GuiRender.cpp:79-87)."""
    from paperrenderer_tpu.render import RayTraceRender

    rp, cam = _scene(32, 32)
    rt = RayTraceRender(rp.scene, rp.materials, width=32, height=32,
                        lights=rp.lights)
    rt.add_instances_from(rp)
    ldr, _ = rt.render(cam)
    img = np.asarray(ldr)
    c = img[16, 16]
    assert c[0] > c[1] and c[0] > c[2] and c[0] > 0.05

    # a foreign registry is rejected (binding rows are registry ids)
    from paperrenderer_tpu import MaterialRegistry

    other = RayTraceRender(rp.scene, MaterialRegistry(), width=32, height=32)
    import pytest as _pt

    with _pt.raises(ValueError):
        other.add_instances_from(rp)


def test_viewer_mode_switch():
    rp, cam = _scene(32, 32)
    rp2, _ = _scene(32, 32)
    v = Viewer({"a": rp, "b": rp2}, cam).start()
    try:
        assert v.wait_frame(1, timeout=180.0)
        _post(v.url + "/mode", {"mode": "b"})
        assert json.loads(_get(v.url + "/modes"))["active"] == "b"
        i = v._frame_index
        assert v.wait_frame(i + 2, timeout=180.0)

        # panel-scoped edits: each mode has its own registry here; an edit
        # carrying mode="a" must index a's registry even while b is active
        mats_a = json.loads(_get(v.url + "/materials?mode=a"))
        assert mats_a["mode"] == "a"
        rid = [m for m in mats_a["materials"] if m["name"] == "red"][0]["id"]
        ok = _post(v.url + "/material",
                   {"id": rid, "mode": "a", "updates": {"roughness": 0.9}})
        assert ok == {"ok": True}
        mats_a2 = json.loads(_get(v.url + "/materials?mode=a"))
        assert [m for m in mats_a2["materials"]
                if m["name"] == "red"][0]["roughness"] == 0.9
    finally:
        v.stop()
