"""Per-step cost: resident vs paged kernel (same metric, debug_steps)."""
import os, sys, time, statistics
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

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

from examples.render_rt import build_rt_scene
from paperrenderer_tpu.ops import accel as A
from paperrenderer_tpu.ops import trace as T
from paperrenderer_tpu.ops.trace_kernel import trace_scene_pallas

W, H = 1920, 1080
eng, rt, cam = build_rt_scene(W, H)
scene = eng.scene
blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
instances = scene.flush()
inst_blas = np.zeros(instances.capacity, np.int32)
for inst in scene.instances:
    inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
tri_attr = A.build_tri_attr(scene)
masks = [jnp.ones(instances.capacity, bool)]
rts, roots = A.assemble_scene(blasset, meta, anim_rest, anim_nodes,
                              instances, jnp.asarray(inst_blas), masks, tri_attr)
ss = A.required_stack_size(meta, instances.capacity)
tiled = T.pick_tile(W, H)
o, d = T.raygen(cam.matrices, W, H, tile_order=tiled)
r = o.shape[0]
tmax = jnp.full((r,), 1000.0)
rec = trace_scene_pallas(rts, o, d, tmax, root_code=roots[0], stack_size=ss,
                         max_steps=10**6, image_shape=(H, W), wide=True,
                         debug_steps=True)
n_pk = r // 1024
steps = np.asarray(rec.bary[..., 0]).reshape(n_pk, 1024)[:, 0]
print(f"resident example@1080p: packets {n_pk} steps/pk mean {steps.mean():.0f} p90 {np.percentile(steps,90):.0f}")
tr = jax.jit(lambda rts, o, d, tm: trace_scene_pallas(
    rts, o, d, tm, root_code=roots[0], stack_size=ss, max_steps=10**6,
    image_shape=(H, W), wide=True).t)
ms = slope_time(tr, rts, o, d, tmax)
tot = steps.sum()
print(f"resident trace: {ms:.2f} ms; total steps {tot/1e6:.2f}M -> {ms*1e6/tot:.0f} ns/step")
