"""TPU validation: a ~1M-triangle single model on the paged packet path.

The reference's BLAS envelope is HBM-sized (AccelerationStructure.cpp:139-216);
round-5 BLAS chunking lifts the old 620 KiB SMEM cap. This traces a million-
triangle sphere through PagedSceneTracer and checks hits against the XLA
lockstep reference on the flattened view.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from paperrenderer_tpu.core import (
    Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
    make_uv_sphere,
)
from paperrenderer_tpu.render import RayTraceRender
from paperrenderer_tpu.ops import accel as A
from paperrenderer_tpu.ops.trace import raygen

rings, sectors = 700, 715      # ~1.0M triangles
scene = Scene()
registry = MaterialRegistry()
t0 = time.time()
big = Model.from_mesh(scene.arena, *make_uv_sphere(
    radius=1.2, rings=rings, sectors=sectors))
print(f"mesh built {time.time()-t0:.1f}s")
rt = RayTraceRender(scene, registry, width=256, height=256,
                    shadow_samples=1, reflection_samples=0, ao_samples=0)
red = Material("red", albedo=(0.8, 0.2, 0.2), roughness=0.5)
m = ModelInstance(big)
rt.add_instance(m, {0: red.instance()})
cam = Camera(yfov_deg=50.0, aspect=1.0, near=0.1, far=100.0)
cam.look_at((0.0, -4.0, 1.5), (0, 0, 0), up=(0, 0, 1))

t0 = time.time()
blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
print(f"BLAS build {time.time()-t0:.1f}s; chunks={meta.num_bchunks} "
      f"static_nodes={meta.num_static_nodes} static_leaves={meta.num_static_leaves}")
assert meta.num_bchunks > 400

instances = scene.flush()
inst_blas = jnp.zeros(instances.capacity, jnp.int32)
tri_attr = A.build_tri_attr(scene)
slots = rt._slot_material_array(instances.capacity)
mask = jnp.ones(instances.capacity, bool)
paged, proot = A.assemble_scene_paged(
    blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
    mask, slots, tri_attr)
ss = A.required_stack_size(meta, instances.capacity)
tracer = A.PagedSceneTracer(paged, slots, rt.materials.table(),
                            root_code=proot, stack_size=ss, use_pallas=True,
                            wide=True)
from paperrenderer_tpu.ops.trace_paged import paged_traversal_ok
print("paged_traversal_ok:", paged_traversal_ok(paged, 1024 * 64))

W = H = 256
o, d = raygen(cam.matrices, W, H)
tmax = jnp.full((W * H,), 1000.0)
t0 = time.time()
rec = tracer.trace(o, d, tmax)
jax.block_until_ready(rec.t)
print(f"paged trace (compile+run) {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(5):
    rec = tracer.trace(o, d, tmax)
jax.block_until_ready(rec.t)
dt = (time.time() - t0) / 5
print(f"paged trace: {dt*1e3:.1f} ms -> {W*H/dt/1e6:.1f} Mrays/s")

hit = np.asarray(rec.t) < np.inf
print(f"hit rate {hit.mean():.4f}")

# XLA reference on a subsampled wavefront (lockstep path is slow at 1M tris)
sub = slice(0, W * H, 61)
flat, remap_root = A.paged_to_flat(paged)
rx = A.trace_scene(flat, o[sub], d[sub], tmax[sub],
                   root_code=remap_root(proot), stack_size=ss)
jax.block_until_ready(rx.t)
hp = hit[sub]
hx = np.asarray(rx.hit)
agree = (hp == hx).mean()
tp = np.asarray(rec.t)[sub]
both = hp & hx
tclose = np.allclose(tp[both], np.asarray(rx.t)[both], rtol=1e-4, atol=1e-4)
pagree = (np.asarray(rec.prim)[sub][both] == np.asarray(rx.prim)[both]).mean()
print(f"vs XLA flat: hit agree {agree:.6f}; t close {tclose}; prim agree {pagree:.5f}")
assert agree == 1.0 and tclose
print("BIG-BLAS VALIDATION PASS")
