"""Validate + benchmark the Pallas packet-traversal kernel on TPU.

Compares trace_scene_pallas against the XLA lockstep trace_scene on the
example scene geometry, then measures Mrays/s (the BASELINE.md config-3
metric of record) for primary rays at 1080p-scale ray counts.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dbg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
sys.path.insert(0, "/root/repo")

from examples.render_scene import build_example_scene  # noqa: E402
from paperrenderer_tpu.ops import accel as A  # noqa: E402
from paperrenderer_tpu.ops.trace import raygen  # noqa: E402
from paperrenderer_tpu.ops.trace_kernel import (  # noqa: E402
    pallas_traversal_ok, trace_scene_pallas,
)


def main():
    print("backend:", jax.default_backend())
    rp, cam = build_example_scene(128, 128)
    scene = rp.scene
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    tri_attr = A.build_tri_attr(scene)
    masks = [jnp.ones(instances.capacity, bool)]
    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), masks, tri_attr,
    )
    ss = A.required_stack_size(meta, instances.capacity)
    print("nodes:", rts.nodes.shape, "leaves:", rts.leaf_rows.shape,
          "stack:", ss, "pallas ok:", pallas_traversal_ok(rts, 1 << 20))

    for size, label in ((128, "correctness"), (1024, "perf-1M")):
        w = h = size
        o, d = raygen(cam.matrices, w, h)
        r = o.shape[0]
        t_max = jnp.full(r, 1000.0)

        rec_p = trace_scene_pallas(
            rts, o, d, t_max, root_code=roots[0], stack_size=ss)
        rec_p.t.block_until_ready()
        if label == "correctness":
            rec_x = A.trace_scene(
                rts, o, d, t_max, root_code=roots[0], stack_size=ss)
            hp = np.asarray(rec_p.hit)
            hx = np.asarray(rec_x.hit)
            print(f"[{size}] hit agree: {(hp == hx).mean():.6f}")
            both = hp & hx
            tp = np.asarray(rec_p.t)[both]
            tx = np.asarray(rec_x.t)[both]
            print(f"[{size}] t close: "
                  f"{np.allclose(tp, tx, rtol=1e-4, atol=1e-4)} "
                  f"max rel {np.max(np.abs(tp - tx) / np.maximum(tx, 1e-6)):.2e}")
            pp = np.asarray(rec_p.prim)[both]
            px = np.asarray(rec_x.prim)[both]
            print(f"[{size}] prim agree: {(pp == px).mean():.4f}")

        iters = 3 if size >= 1024 else 10
        t0 = time.perf_counter()
        for _ in range(iters):
            rec_p = trace_scene_pallas(
                rts, o, d, t_max, root_code=roots[0], stack_size=ss)
        rec_p.t.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"[{size}] pallas: {dt*1e3:.2f} ms  "
              f"{r / dt / 1e6:.2f} Mrays/s")

        if size <= 128:
            t0 = time.perf_counter()
            for _ in range(iters):
                rec_x = A.trace_scene(
                    rts, o, d, t_max, root_code=roots[0], stack_size=ss)
            rec_x.t.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            print(f"[{size}] xla:    {dt*1e3:.2f} ms  "
                  f"{r / dt / 1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
