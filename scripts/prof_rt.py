"""Profile the two-level RT path: BLAS build, TLAS refit, traversal, frame.

BASELINE config 3 (static RT, example scene, 1080p) + config 4 (hybrid).
Usage: python scripts/prof_rt.py [--width 1920 --height 1080]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, iters=5, warmup=1):
    import jax

    out = None
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--wide", action="store_true",
                   help="A/B the 4-wide grandchild box step (bvh_wide)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dbg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as A
    from paperrenderer_tpu.ops.trace import raygen
    from paperrenderer_tpu.ops.trace_kernel import trace_scene_pallas

    W, H = args.width, args.height
    eng, rt, cam = build_rt_scene(W, H)
    scene = eng.scene

    # BLAS build (host, once per topology — config 3 "BLAS build ms")
    t0 = time.perf_counter()
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    jax.block_until_ready(blasset.nodes)
    blas_ms = (time.perf_counter() - t0) * 1e3
    print(f"BLAS build (host, {meta.num_blas} BLAS): {blas_ms:.2f} ms")

    instances = scene.flush()
    inst_blas = rt.accel.inst_blas(instances.capacity)
    tri_attr = rt.accel.tri_attr()
    masks = [jnp.ones(instances.capacity, bool)]
    ss = rt.accel.stack_size(instances.capacity)

    # TLAS refit (per-frame; the updateTLAS analogue)
    import functools

    @jax.jit
    def tlas_refit(instances, inst_blas, tri_attr):
        rts, roots = A.assemble_scene(
            blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
            masks, tri_attr)
        return rts.nodes

    ms, _ = timeit(lambda: tlas_refit(instances, inst_blas, tri_attr))
    print(f"TLAS refit/assemble:    {ms:8.2f} ms/frame")

    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
        masks, tri_attr)

    # primary traversal at full res (Mrays/s of record)
    o, d = raygen(cam.matrices, W, H)
    r = o.shape[0]
    t_max = jnp.full(r, 1000.0)

    def trace(wide=False):
        return trace_scene_pallas(
            rts, o, d, t_max, root_code=roots[0], stack_size=ss,
            image_shape=(H, W), wide=wide).t

    ms, _ = timeit(trace)
    mrays = r / (ms / 1e3) / 1e6
    print(f"primary trace {W}x{H}:  {ms:8.2f} ms  ({mrays:.1f} Mrays/s)")
    if args.wide:
        ms, _ = timeit(lambda: trace(wide=True))
        mrays = r / (ms / 1e3) / 1e6
        print(f"primary trace WIDE:     {ms:8.2f} ms  ({mrays:.1f} Mrays/s)")

    # full RT frame (primary + shadows + AO + reflections + tonemap)
    ldr, aux = rt.render(cam)
    ldr.block_until_ready()
    ms, _ = timeit(lambda: rt.render(cam)[0])
    print(f"FULL RT FRAME:          {ms:8.2f} ms  ({1000.0/ms:.2f} fps)")
    if args.wide:
        rt.bvh_wide = True
        ldr, _ = rt.render(cam)
        ldr.block_until_ready()
        ms, _ = timeit(lambda: rt.render(cam)[0])
        print(f"FULL RT FRAME WIDE:     {ms:8.2f} ms  ({1000.0/ms:.2f} fps)")
        rt.bvh_wide = False

    # hybrid frame (config 4)
    from examples.render_hybrid import build_hybrid_scene

    eng2, hy, cam2 = build_hybrid_scene(W, H)
    ldr, aux = hy.render(cam2)
    ldr.block_until_ready()
    ms, _ = timeit(lambda: hy.render(cam2)[0])
    print(f"HYBRID FRAME:           {ms:8.2f} ms  ({1000.0/ms:.2f} fps)")


if __name__ == "__main__":
    main()
