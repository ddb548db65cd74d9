"""Probe 2: decompose the packet-trace fixed floor.

(a) raw pallas pass-through kernel with the same block structure (pure
    plumbing: DMA + grid overhead, zero traversal);
(b) all-dead closest vs any-hit at several SUBPACKETS values;
(c) step counts (debug_steps) for the all-dead any-hit wave — if dead
    rays take >1 traversal step in any-hit mode something is wrong.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, iters=10, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as ACC
    from paperrenderer_tpu.ops import trace as T
    from paperrenderer_tpu.ops import trace_kernel as TK

    W, H = 1920, 1080
    eng, rt, cam = build_rt_scene(W, H)
    scene = eng.scene
    cm = cam.matrices
    instances = scene.flush()
    blasset, meta, anim_rest, anim_nodes = rt.accel.blas()
    slots, masks, table = rt._device_inputs(instances.capacity)
    ss = rt.accel.stack_size(instances.capacity)

    tiled = T.pick_tile(W, H)
    o, d = T.raygen(cm, W, H, tile_order=tiled)
    r = o.shape[0]
    tmax = jnp.full((r,), 1000.0)
    dead = jnp.zeros((r,), bool)

    # ---- (a) raw plumbing: identity kernel, same 7-in/5-out block layout
    for sub in (1, 4):
        step = sub * TK.PACKET
        r_pad = -(-r // step) * step
        g = r_pad // step
        comp = lambda x, f: jnp.pad(x, (0, r_pad - r),
                                    constant_values=f).reshape(g * sub, 8, 128)
        args = [comp(o[:, k], 0.0) for k in range(3)]
        args += [comp(d[:, k], 1.0) for k in range(3)]
        args.append(comp(tmax, -3e38))
        spec = pl.BlockSpec((sub, 8, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

        def ident(a0, a1, a2, a3, a4, a5, a6, o0, o1, o2, o3, o4):
            o0[...] = a0[...]
            o1[...] = pltpu.bitcast(a1[...], jnp.int32)
            o2[...] = pltpu.bitcast(a2[...], jnp.int32)
            o3[...] = a3[...]
            o4[...] = a4[...]

        f32 = jnp.float32
        dts = [f32, jnp.int32, jnp.int32, f32, f32]
        call = pl.pallas_call(
            ident, grid=(g,), in_specs=[spec] * 7, out_specs=[spec] * 5,
            out_shape=[jax.ShapeDtypeStruct((g * sub, 8, 128), dt)
                       for dt in dts])
        fn = jax.jit(call)
        t = timeit(lambda: fn(*args)[0])
        print(f"identity kernel sub={sub}:      {t:7.2f} ms", flush=True)

    # ---- (b) dead-floor sweep over SUBPACKETS
    for sub in (1, 2, 4, 8):
        TK.SUBPACKETS = sub
        ctx = ACC.make_scene_tracer(
            blasset, meta, anim_rest, anim_nodes, instances,
            rt.accel.inst_blas(instances.capacity), masks,
            rt.accel.tri_attr(), slots, table, tlas_index=0, stack_size=ss,
            leaf_cutout=False, use_pallas=True, paged=False,
            textures=None, time=jnp.float32(0.0), animate=None, wide=True,
        )
        t_dead = timeit(jax.jit(
            lambda c=ctx: c.trace(o, d, tmax, active=dead).t))
        t_any = timeit(jax.jit(
            lambda c=ctx: c.trace(o, d, tmax, any_hit=True, active=dead).t))
        t_live = timeit(jax.jit(lambda c=ctx: c.trace(o, d, tmax).t))
        print(f"sub={sub}: dead={t_dead:6.2f}  dead-anyhit={t_any:6.2f}  "
              f"live={t_live:6.2f} ms", flush=True)
    TK.SUBPACKETS = 4

    # ---- (c) step counts for dead any-hit
    ctx = ACC.make_scene_tracer(
        blasset, meta, anim_rest, anim_nodes, instances,
        rt.accel.inst_blas(instances.capacity), masks,
        rt.accel.tri_attr(), slots, table, tlas_index=0, stack_size=ss,
        leaf_cutout=False, use_pallas=True, paged=False,
        textures=None, time=jnp.float32(0.0), animate=None, wide=True,
    )
    from paperrenderer_tpu.ops.trace_kernel import trace_scene_pallas
    sc = ctx.scene
    hit = trace_scene_pallas(sc, o, d, tmax, root_code=ctx.root_code,
                             stack_size=ss, any_hit=True, active=dead,
                             debug_steps=True, wide=True)
    steps = hit.bary[:, 0]
    print(f"dead any-hit step counts: min={float(steps.min())} "
          f"max={float(steps.max())} mean={float(steps.mean()):.2f}",
          flush=True)


if __name__ == "__main__":
    main()
