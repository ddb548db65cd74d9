"""Sorted-translucency tests: blending order, alpha, opaque interaction."""

import numpy as np

from paperrenderer_tpu.core import (
    Camera,
    Material,
    MaterialRegistry,
    Model,
    ModelInstance,
    Scene,
    SHADE_TRANSLUCENT,
    make_plane,
)
from paperrenderer_tpu.render import RenderPass


def _scene():
    scene = Scene()
    registry = MaterialRegistry()
    panel = Model.from_mesh(scene.arena, *make_plane(size=2.0), name="panel")
    return scene, registry, panel


def _cam():
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    # look along +y at panels standing in the x-z plane? plane is z=0;
    # instead look straight down at stacked horizontal panels
    cam.look_at((0.0, 0.0, 6.0), (0.0, 0.0, 0.0), up=(0, 1, 0))
    return cam


def test_translucent_blend_over_opaque():
    scene, registry, panel = _scene()
    rp = RenderPass(scene, registry, width=32, height=32, translucent_layers=2)
    white = Material("white", albedo=(1.0, 1.0, 1.0), roughness=1.0,
                     emissive=(0.5, 0.5, 0.5))
    red_glass = Material(
        "red-glass", albedo=(0.0, 0.0, 0.0), emissive=(1.0, 0.0, 0.0),
        alpha=0.5, shading_model=SHADE_TRANSLUCENT,
    )
    base = ModelInstance(panel)             # opaque panel at z=0
    rp.add_instance(base, {0: white.instance()})
    glass = ModelInstance(panel)            # translucent panel above it
    glass.set_transform(pos=(0.0, 0.0, 1.0))
    rp.add_instance(glass, {0: red_glass.instance()})
    ldr, aux = rp.render(_cam())
    c = np.asarray(ldr)[16, 16]
    # blended: red emissive at alpha 0.5 over the lit white panel -> red
    # dominant but green/blue still present from the base layer
    assert c[0] > c[1] and c[0] > c[2]
    assert c[1] > 0.02 and c[2] > 0.02


def test_two_layers_order():
    """Nearer translucent layer must dominate: red above green reads redder
    than green above red."""
    scene, registry, panel = _scene()

    def build(top_red):
        scene = Scene()
        registry = MaterialRegistry()
        panel = Model.from_mesh(scene.arena, *make_plane(size=2.0))
        rp = RenderPass(scene, registry, width=16, height=16, translucent_layers=3)
        red = Material("r", emissive=(1, 0, 0), alpha=0.6, shading_model=SHADE_TRANSLUCENT)
        green = Material("g", emissive=(0, 1, 0), alpha=0.6, shading_model=SHADE_TRANSLUCENT)
        lo, hi = (green, red) if top_red else (red, green)
        a = ModelInstance(panel)
        rp.add_instance(a, {0: lo.instance()})
        b = ModelInstance(panel)
        b.set_transform(pos=(0, 0, 1.0))
        rp.add_instance(b, {0: hi.instance()})
        ldr, _ = rp.render(_cam())
        return np.asarray(ldr)[8, 8]

    red_top = build(True)
    green_top = build(False)
    assert red_top[0] > green_top[0]
    assert green_top[1] > red_top[1]


def test_translucent_behind_opaque_hidden():
    scene, registry, panel = _scene()
    rp = RenderPass(scene, registry, width=16, height=16, translucent_layers=2)
    white = Material("white", emissive=(1, 1, 1))
    glass = Material("glass", emissive=(1, 0, 0), alpha=0.9,
                     shading_model=SHADE_TRANSLUCENT)
    top = ModelInstance(panel)   # opaque on top
    top.set_transform(pos=(0, 0, 2.0))
    rp.add_instance(top, {0: white.instance()})
    below = ModelInstance(panel)
    rp.add_instance(below, {0: glass.instance()})
    ldr, _ = rp.render(_cam())
    c = np.asarray(ldr)[8, 8]
    # the red translucent panel is behind the opaque white one: no red tint
    assert abs(float(c[0]) - float(c[1])) < 1e-3


def test_exact_peel_matches_xla_peel(monkeypatch):
    """The binned-kernel depth-peel path (use_exact, interpret mode) must
    produce the same image as the pure-XLA peel."""
    import jax.numpy as jnp

    from paperrenderer_tpu.ops import raster_exact as RE
    from paperrenderer_tpu.ops import static_batch as SB
    from paperrenderer_tpu.ops.raster import rasterize, resolve_gbuffer_packed, pack_attributes
    from paperrenderer_tpu.ops.shading import shade_gbuffer
    from paperrenderer_tpu.ops.translucency import composite_translucency, non_opaque_mask

    monkeypatch.setattr(RE, "INTERPRET", True)

    scene, registry, panel = _scene()
    rp = RenderPass(scene, registry, width=128, height=32, translucent_layers=2)
    white = Material("white", albedo=(1.0, 1.0, 1.0), roughness=1.0,
                     emissive=(0.5, 0.5, 0.5))
    red_glass = Material(
        "red-glass", albedo=(0.0, 0.0, 0.0), emissive=(1.0, 0.0, 0.0),
        alpha=0.5, shading_model=SHADE_TRANSLUCENT,
    )
    green_glass = Material(
        "green-glass", albedo=(0.0, 0.0, 0.0), emissive=(0.0, 1.0, 0.0),
        alpha=0.5, shading_model=SHADE_TRANSLUCENT,
    )
    base = ModelInstance(panel)
    rp.add_instance(base, {0: white.instance()})
    g1 = ModelInstance(panel)
    g1.set_transform(pos=(0.0, 0.0, 1.0))
    rp.add_instance(g1, {0: green_glass.instance()})
    g2 = ModelInstance(panel)
    g2.set_transform(pos=(0.3, 0.0, 2.0))
    rp.add_instance(g2, {0: red_glass.instance()})
    cam = _cam()

    instances = scene.flush()
    slots, visible, table = rp._device_inputs(instances.capacity)
    mapping = rp._current_mapping()
    batch, _ = SB.expand_static(
        mapping, instances, scene.tables(), cam.matrices, slots, visible)
    opaque = ~non_opaque_mask(table, batch.material)
    import dataclasses as _dc

    obatch = _dc.replace(batch, valid=batch.valid & opaque)
    depth, tid, bary = rasterize(obatch, 128, 32)
    gbuf = resolve_gbuffer_packed(
        pack_attributes(obatch), depth, tid, bary, cam.matrices)
    hdr = shade_gbuffer(gbuf, table, rp.lights, cam.matrices.cam_pos)

    out_xla, _ = composite_translucency(
        hdr, depth, batch, table, rp.lights, cam.matrices, layers=2,
        use_exact=False)
    out_exact, req = composite_translucency(
        hdr, depth, batch, table, rp.lights, cam.matrices, layers=2,
        use_exact=True)
    np.testing.assert_allclose(
        np.asarray(out_exact), np.asarray(out_xla), atol=2e-3)
    # the peel passes report their pair demand (overflow-growth input)
    assert int(req) > 0
