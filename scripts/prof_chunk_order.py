"""Does TLAS chunk QUALITY move the crowd? morton vs balanced k-d order.

Measures steps/packet + trace time for the 10k-instance crowd with the
default in-graph morton chunking vs a host-built balanced k-d partition
(recursive median split on the widest axis into equal-size cells, cell
order = depth-first -> chunks are spatially tight AND balanced).
"""
import os, sys, time, statistics
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from examples.render_crowd import build_crowd_scene
from paperrenderer_tpu.ops import accel as A
from paperrenderer_tpu.ops import trace as T
from paperrenderer_tpu.ops.trace_paged import trace_scene_pallas_paged

def slope_time(fn, *args, n1=4, reps=3):
    out = None
    for _ in range(3): out = fn(*args)
    jax.block_until_ready(out)
    sl = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n1): out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        for _ in range(3 * n1): out = fn(*args)
        jax.block_until_ready(out)
        t2 = time.perf_counter()
        sl.append(((t2 - t1) - (t1 - t0)) / (2 * n1))
    return statistics.median(sl) * 1e3

scene, registry, rt, cam = build_crowd_scene(10000, 1024, 1024)
W = H = 1024
blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
instances = scene.flush()
inst_blas = np.zeros(instances.capacity, np.int32)
for inst in scene.instances:
    inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
inst_blas = jnp.asarray(inst_blas)
tri_attr = A.build_tri_attr(scene)
mask = jnp.ones(instances.capacity, bool)
slots = rt._slot_material_array(instances.capacity)
ss = A.required_stack_size(meta, instances.capacity)
tiled = T.pick_tile(W, H)
o, d = T.raygen(cam.matrices, W, H, tile_order=tiled)
r = o.shape[0]
tmax = jnp.full((r,), 1000.0)

def kd_order(pos, alive):
    """Balanced k-d order: dead last, alive recursively median-split."""
    ids = np.where(alive)[0]
    out = []
    def split(ids):
        if len(ids) <= A.CHUNK:
            out.extend(ids.tolist())
            return
        p = pos[ids]
        ax = int(np.argmax(p.max(0) - p.min(0)))
        half = (len(ids) // 2 // A.CHUNK) * A.CHUNK or len(ids) // 2
        part = np.argpartition(p[:, ax], half - 1)
        split(ids[part[:half]]); split(ids[part[half:]])
    split(ids)
    out.extend(np.where(~alive)[0].tolist())
    return np.asarray(out, np.int32)

pos = np.asarray(instances.pos)
alive = np.asarray(instances.alive)

for name, override in (
    ("morton", None),
    ("kd", jnp.asarray(kd_order(pos, alive)))):
    ps, root = A.assemble_scene_paged(
        blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
        mask, slots, tri_attr, order_override=override)
    tr = A.PagedSceneTracer(ps, slots, rt.materials.table(), root_code=root,
                            stack_size=ss, use_pallas=True, wide=True,
                            image_shape=(H, W))
    rec = trace_scene_pallas_paged(
        ps, o, d, tmax, root_code=root, stack_size=ss,
        max_steps=tr._step_bound(), image_shape=(H, W), wide=True,
        debug_steps=True)
    n_pk = r // 1024
    steps = np.asarray(rec.bary[..., 0]).reshape(n_pk, 1024)[:, 0]
    pc = jax.jit(lambda ps, o, d, tm, tr=tr: tr.trace(o, d, tm).t)
    ms = slope_time(pc, ps, o, d, tmax)
    prim = jax.jit(lambda ps, o, d, tm, tr=tr: tr.trace_resolve(o, d, tm).t)
    ms_r = slope_time(prim, ps, o, d, tmax)
    print(f"{name}: steps/pk mean {steps.mean():.0f} p90 "
          f"{np.percentile(steps, 90):.0f}; closest-hit {ms:.1f} ms; "
          f"resolve {ms_r:.1f} ms")
