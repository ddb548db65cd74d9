"""Measure packet-traversal per-step cost split (fixed vs vector work).

Decides whether a BVH4 (4-wide box step) rebuild pays: BVH4 halves the
while-loop step count but keeps total slab-test vector work roughly
constant, so its win is bounded by the per-step FIXED overhead (loop
branch, scalar stack ops, code loads, push logic).

Method: trace the example RT scene's primary wavefront twice —
once normally (timed), once with debug_steps=True (step counts per
packet). The Pallas grid is sequential on one TensorCore, so

    time_per_step = frame_time / sum(steps over packets)

Separately, a synthetic 2-ray-packet scene with a known tiny tree gives a
box-step-only timing; the difference approximates the leaf-step share.

Run on the real TPU:  python scripts/prof_steps.py [--size 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as A
    from paperrenderer_tpu.ops.trace import raygen
    from paperrenderer_tpu.ops.trace_kernel import (
        PACKET, pallas_traversal_ok, trace_scene_pallas,
    )

    W, H = args.width, args.height
    eng, rt, cam = build_rt_scene(W, H)
    scene = eng.scene
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = rt.accel.inst_blas(instances.capacity)
    tri_attr = rt.accel.tri_attr()
    masks = [jnp.ones(instances.capacity, bool)]
    ss = rt.accel.stack_size(instances.capacity)
    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
        masks, tri_attr)
    o, d = raygen(cam.matrices, W, H)
    r = o.shape[0]
    t_max = jnp.full(r, 1000.0)
    assert pallas_traversal_ok(rts, r), "scene must fit the packet kernel"

    kw = dict(root_code=roots[0], stack_size=ss, image_shape=(H, W))

    def timed(fn, iters=20):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    dt = timed(lambda: trace_scene_pallas(rts, o, d, t_max, **kw).t)
    # debug_steps reports the final step counter in the u channel (one value
    # per packet, broadcast over its 1024 rays)
    rec = trace_scene_pallas(rts, o, d, t_max, debug_steps=True, **kw)
    u = jax.device_get(rec.u)
    if H % 8 == 0 and W % 128 == 0:
        # image mode: one (8, 128) pixel tile per packet
        steps_per_packet = u.reshape(H, W)[::8, ::128].reshape(-1)
    else:
        steps_per_packet = u.reshape(-1, PACKET)[:, 0]
    total_steps = int(steps_per_packet.sum())
    n_packets = steps_per_packet.shape[0]

    print(f"rays={r}  packets={n_packets}  steps_total={total_steps}  "
          f"steps/packet min/mean/max = {steps_per_packet.min()}/"
          f"{steps_per_packet.mean():.1f}/{steps_per_packet.max()}")
    print(f"trace time {dt*1e3:.2f} ms  ->  {dt/total_steps*1e9:.1f} ns/step")
    mrays = r / dt / 1e6
    print(f"({mrays:.1f} Mrays/s)")

    # Leaf/box step split: count leaf visits by summing over the scene how
    # often prims resolve — instead, estimate structurally: leaves hold K=8
    # triangles; a packet's leaf steps = distinct leaves visited. We can't
    # separate in-kernel without another debug channel; report the tree
    # shape so the box:leaf ratio can be bounded.
    nn = rts.nodes.shape[0]
    nl = rts.leaf_rows.shape[0]
    print(f"scene: {nn} node rows, {nl} leaf rows "
          f"(upper-bound box:leaf step ratio ~ {nn / max(nl, 1):.2f})")
    print()
    print("BVH4 decision rule: BVH4 saves ~half the BOX steps' fixed cost.")
    print("If ns/step * 0.5 * box_fraction * steps_total is < ~2 ms/frame,")
    print("BVH4 is not worth the surgery.")


if __name__ == "__main__":
    main()
