"""Probe: active-ray fractions of the RT frame's secondary wavefronts, and
per-block activity histograms (sizing data for wavefront compaction).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from examples.render_rt import build_rt_scene
from paperrenderer_tpu.ops import accel as A
from paperrenderer_tpu.ops import trace as T

W, H = 1920, 1080
eng, rt, cam = build_rt_scene(W, H)
instances = rt.scene.flush()
blasset, meta, anim_rest, anim_nodes = rt.accel.blas()
inst_blas = rt.accel.inst_blas(instances.capacity)
tri_attr = rt.accel.tri_attr()
slots, masks, table = rt._device_inputs(instances.capacity)
ss = rt.accel.stack_size(instances.capacity)

use_pallas = jax.default_backend() not in ("cpu",)
ctx = A.make_scene_tracer(
    blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
    masks, tri_attr, slots, table,
    tlas_index=0, stack_size=ss, use_pallas=use_pallas,
)

tiled = T.pick_tile(W, H)
o, d = raygen_out = T.raygen(cam.matrices, W, H, tile_order=tiled)
r = o.shape[0]
surf = ctx.trace_resolve(o, d, jnp.full((r,), 1000.0))
print("primary valid:", float(jnp.mean(surf.valid)))

key = jax.random.fold_in(jax.random.PRNGKey(0), 7)
from paperrenderer_tpu.ops.trace import _cosine_sample, _default_basis
from paperrenderer_tpu.ops.shading import lookup_material_params

albedo, _, rough, metal = lookup_material_params(table, surf.material)
v = cam.matrices.cam_pos - surf.world_pos
v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
n_dot_v = jnp.maximum(jnp.sum(surf.normal * v, axis=-1), 0.0)
max_angle = rough * (1.0 - jnp.power(1.0 - n_dot_v, 5.0))
tx, ty = _default_basis(surf.normal)
k = jax.random.fold_in(key, 2000)
r1, r2 = jax.random.uniform(k, (2, r))
pert_n = _cosine_sample(surf.normal, tx, ty, max_angle, r1, r2)
rdir = -v + 2.0 * jnp.sum(pert_n * v, axis=-1, keepdims=True) * pert_n
orig = surf.world_pos + surf.normal * 1e-3
hit2 = ctx.trace_resolve(orig, rdir, jnp.full((r,), 1000.0),
                         active=surf.valid)
print("bounce active (=primary valid):", float(jnp.mean(surf.valid)))
print("hit2 valid (2nd shadow/AO active):", float(jnp.mean(hit2.valid)))

# 2nd shadow additionally gates on ndl > 0
lights = rt.lights
lpos = lights.position[0]
to_l = lpos - hit2.world_pos
dist = jnp.linalg.norm(to_l, axis=-1)
ldir = to_l / jnp.maximum(dist, 1e-9)[:, None]
ndl = jnp.sum(hit2.normal * ldir, axis=-1)
act_sh = hit2.valid & (ndl > 0.0)
print("2nd shadow active:", float(jnp.mean(act_sh)))

# per-block histograms for candidate block sizes
for name, act in [("bounce", surf.valid), ("hit2", hit2.valid),
                  ("2nd_shadow", act_sh)]:
    a = np.asarray(act)
    for B in (128, 256, 1024):
        blocks = a.reshape(-1, B)
        any_act = blocks.any(axis=1)
        frac_blocks = any_act.mean()
        occupancy = blocks.sum() / max(1, any_act.sum() * B)
        print(f"{name}: B={B}: active_blocks={frac_blocks:.3f} "
              f"mean_occupancy_of_active={occupancy:.3f}")
