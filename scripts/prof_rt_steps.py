"""Probe: traversal STEP counts per packet for each RT wavefront
(debug_steps kernel) — the footprint cost model made measurable.

For each wavefront prints total steps, mean steps per packet, and the split
between fully-dead / partial / full packets.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from examples.render_rt import build_rt_scene
from paperrenderer_tpu.ops import accel as ACC
from paperrenderer_tpu.ops import trace as T
from paperrenderer_tpu.ops.trace_kernel import PACKET, trace_scene_pallas

W, H = 1920, 1080
eng, rt, cam = build_rt_scene(W, H)
cm = cam.matrices
instances = eng.scene.flush()
blasset, meta, anim_rest, anim_nodes = rt.accel.blas()
slots, masks, table = rt._device_inputs(instances.capacity)
ss = rt.accel.stack_size(instances.capacity)
ctx = ACC.make_scene_tracer(
    blasset, meta, anim_rest, anim_nodes, instances,
    rt.accel.inst_blas(instances.capacity), masks, rt.accel.tri_attr(),
    slots, table, tlas_index=0, stack_size=ss, use_pallas=True,
)
scene_rt = ctx.scene
root = ctx.root_code
key = jax.random.PRNGKey(1)

tiled = T.pick_tile(W, H)
o, d = T.raygen(cm, W, H, tile_order=tiled)
r = o.shape[0]
tmax = jnp.full((r,), 1000.0)


def steps_of(o_, d_, tmax_, active, any_hit, name):
    rec = trace_scene_pallas(
        scene_rt, o_, d_, tmax_, root_code=root, stack_size=ss,
        any_hit=any_hit, active=active, debug_steps=True,
        max_steps=ctx._step_bound())
    # debug_steps: the u output plane carries the packet's step count
    steps = np.asarray(rec.bary[:, 0]).reshape(-1, PACKET)[:, 0]
    act = (np.ones(r, bool) if active is None
           else np.asarray(active)).reshape(-1, PACKET)
    occ = act.mean(axis=1)
    dead = occ == 0
    total = steps.sum()
    print(f"{name:14s} total_steps={total/1e3:9.1f}k  "
          f"mean/packet={steps.mean():7.1f}  "
          f"dead_pk={dead.mean():.2f} (steps {steps[dead].sum()/1e3:.1f}k)  "
          f"partial_pk={((occ>0)&(occ<1)).mean():.2f} "
          f"(steps {steps[(occ>0)&(occ<1)].sum()/1e3:.1f}k, "
          f"mean occ {occ[(occ>0)&(occ<1)].mean() if ((occ>0)&(occ<1)).any() else 0:.2f})  "
          f"full_pk={(occ==1).mean():.2f} "
          f"(steps {steps[occ==1].sum()/1e3:.1f}k)")
    return steps


steps_of(o, d, tmax, None, False, "primary")
surf = ctx.trace_resolve(o, d, tmax)

# shadow wavefront (sample 0)
lights = rt.lights
origin = surf.world_pos + surf.normal * 5e-3
lpos = lights.position[0]
to_l = lpos - surf.world_pos
dist = jnp.linalg.norm(to_l, axis=-1)
ldir = to_l / jnp.maximum(dist, 1e-9)[:, None]
ndl = jnp.sum(surf.normal * ldir, axis=-1)
act_sh = surf.valid & (ndl > 0.0)
steps_of(origin, ldir, dist, act_sh, True, "shadow(center)")

# AO wavefront (sample 0)
from paperrenderer_tpu.ops.trace import _cosine_sample, _default_basis

tx, ty = _default_basis(surf.normal)
k = jax.random.fold_in(key, 1000)
r1, r2 = jax.random.uniform(k, (2, r))
dao = _cosine_sample(surf.normal, tx, ty, jnp.ones((r,)), r1, r2)
steps_of(surf.world_pos + surf.normal * 1e-3, dao,
         jnp.full((r,), rt.ao_radius), surf.valid, False, "ao")

# bounce
from paperrenderer_tpu.ops.shading import lookup_material_params

albedo, _, rough, metal = lookup_material_params(table, surf.material)
v = cm.cam_pos - surf.world_pos
v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
n_dot_v = jnp.maximum(jnp.sum(surf.normal * v, axis=-1), 0.0)
max_angle = rough * (1.0 - jnp.power(1.0 - n_dot_v, 5.0))
k = jax.random.fold_in(jax.random.fold_in(key, 7), 2000)
r1, r2 = jax.random.uniform(k, (2, r))
pert_n = _cosine_sample(surf.normal, tx, ty, max_angle, r1, r2)
rdir = -v + 2.0 * jnp.sum(pert_n * v, axis=-1, keepdims=True) * pert_n
o2 = surf.world_pos + surf.normal * 1e-3
steps_of(o2, rdir, tmax, surf.valid, False, "bounce")
hit2 = ctx.trace_resolve(o2, rdir, tmax, active=surf.valid)

# 2nd shadows
origin2 = hit2.world_pos + hit2.normal * 5e-3
to_l2 = lpos - hit2.world_pos
dist2 = jnp.linalg.norm(to_l2, axis=-1)
ldir2 = to_l2 / jnp.maximum(dist2, 1e-9)[:, None]
ndl2 = jnp.sum(hit2.normal * ldir2, axis=-1)
act2 = hit2.valid & (ndl2 > 0.0)
steps_of(origin2, ldir2, dist2, act2, True, "2nd shadow")

# 2nd AO
tx2, ty2 = _default_basis(hit2.normal)
k2 = jax.random.fold_in(key, 1001)
r1, r2 = jax.random.uniform(k2, (2, r))
dao2 = _cosine_sample(hit2.normal, tx2, ty2, jnp.ones((r,)), r1, r2)
steps_of(hit2.world_pos + hit2.normal * 1e-3, dao2,
         jnp.full((r,), rt.ao_radius), hit2.valid, False, "2nd ao")
