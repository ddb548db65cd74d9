"""Leaf alpha-cutout tests (reference leaf.glsl/leaf.rahit parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from paperrenderer_tpu.core import (
    Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
    SHADE_LEAF, make_plane,
)
from paperrenderer_tpu.ops.shading import leaf_alpha
from paperrenderer_tpu.render import RenderPass


def test_leaf_alpha_pattern():
    """Matches the reference getAlpha: lens around v=0.5, zero at u edges."""
    uv = jnp.asarray([
        [0.5, 0.5],   # center -> inside
        [0.5, 0.75],  # beyond max half-width 0.2 -> outside
        [0.0, 0.5],   # u edge: curve=0 -> outside (abs(y)=0 not < 0)
        [0.25, 0.55], # curve at u=.25: (1-(0.25)^2... = (-(0.5)^2+1)*0.2=0.15 > 0.05 -> inside
    ])
    a = np.asarray(leaf_alpha(uv))
    assert a.tolist() == [1.0, 0.0, 0.0, 1.0]


def test_leaf_cutout_reveals_background():
    """A leaf-material panel renders the pattern: transparent at the UV
    corners, opaque at the center."""
    scene = Scene()
    registry = MaterialRegistry()
    panel = Model.from_mesh(scene.arena, *make_plane(size=2.0))
    rp = RenderPass(scene, registry, width=32, height=32, translucent_layers=2)
    leaf = Material("leaf", emissive=(0.0, 1.0, 0.0), shading_model=SHADE_LEAF)
    back = Material("back", emissive=(1.0, 0.0, 0.0))
    leaf_inst = ModelInstance(panel)
    leaf_inst.set_transform(pos=(0, 0, 1.0))
    rp.add_instance(leaf_inst, {0: leaf.instance()})
    bg = ModelInstance(panel)  # opaque red panel behind
    rp.add_instance(bg, {0: back.instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=100.0)
    cam.look_at((0.0, 0.0, 6.0), (0.0, 0.0, 0.0), up=(0, 1, 0))
    ldr, _ = rp.render(cam)
    img = np.asarray(ldr)
    # center of the panel = uv (0.5, 0.5) -> leaf opaque -> green
    c = img[16, 16]
    assert c[1] > c[0]
    # above the lens (v far from 0.5) -> cutout -> red background shows
    k = img[12, 16]
    assert k[0] > k[1] and k[0] > 0.05
