"""Step composition of the paged kernel on the crowd scene."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import argparse

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=10000)
p.add_argument("--size", type=int, default=1024)
args = p.parse_args()

import jax, jax.numpy as jnp, numpy as np
from examples.render_crowd import build_crowd_scene
from paperrenderer_tpu.ops import accel as A
from paperrenderer_tpu.ops import trace as T
from paperrenderer_tpu.ops.trace_paged import trace_scene_pallas_paged

scene, registry, rt, cam = build_crowd_scene(args.n, args.size, args.size)
W = H = args.size
blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
instances = scene.flush()
inst_blas = np.zeros(instances.capacity, np.int32)
for inst in scene.instances:
    inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
inst_blas = jnp.asarray(inst_blas)
tri_attr = A.build_tri_attr(scene)
mask = jnp.ones(instances.capacity, bool)
slots = rt._slot_material_array(instances.capacity)
ps, root = A.assemble_scene_paged(
    blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
    mask, slots, tri_attr)
ss = A.required_stack_size(meta, instances.capacity)
tracer = A.PagedSceneTracer(ps, slots, rt.materials.table(), root_code=root,
                            stack_size=ss, use_pallas=True, wide=rt.bvh_wide,
                            image_shape=(H, W))
tiled = T.pick_tile(W, H)
o, d = T.raygen(cam.matrices, W, H, tile_order=tiled)
r = o.shape[0]
tmax = jnp.full((r,), 1000.0)
rec = trace_scene_pallas_paged(
    ps, o, d, tmax, root_code=root, stack_size=ss,
    max_steps=tracer._step_bound(), image_shape=(H, W),
    wide=rt.bvh_wide, debug_steps=True)
n_pk = r // 1024
steps = np.asarray(rec.bary[..., 0]).reshape(n_pk, 1024)[:, 0]
chunks = np.asarray(rec.bary[..., 1]).reshape(n_pk, 1024)[:, 0]
print(f"packets {n_pk}")
print(f"steps/packet  mean {steps.mean():.0f} p50 {np.percentile(steps,50):.0f} p90 {np.percentile(steps,90):.0f} max {steps.max():.0f}")
print(f"chunks/packet mean {chunks.mean():.1f} p50 {np.percentile(chunks,50):.0f} p90 {np.percentile(chunks,90):.0f} max {chunks.max():.0f}")
print(f"total chunks in scene: {ps.chunk_codes.shape[0] // (A.BROWS*2)}")

# step-type mix (v output = leaf | inst<<11)
li = np.asarray(rec.bary[..., 1]).reshape(n_pk, 1024)[:, 0].astype(np.int64)
leaf = li & 2047
inst = li >> 11
box = steps - leaf - inst - chunks
print(f"mix/packet: box {box.mean():.0f} leaf {leaf.mean():.0f} inst {inst.mean():.0f} chunk {chunks.mean():.1f}")
