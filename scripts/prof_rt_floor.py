"""Probe: per-wave FIXED cost floor of the packet tracer.

Measures (a) an all-dead trace (every packet exits after its root test:
init + 1 step + block IO only), (b) a fully-active primary-like trace, and
(c) the XLA-side ray-build cost of one secondary wave (cosine sample +
basis, no trace). Separates per-packet fixed cost + HBM round-trips from
traversal-step cost — decides how much a fused multi-wave kernel can save.
"""

import os
import sys
import time

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

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as ACC
    from paperrenderer_tpu.ops import trace as T

    W, H = 1920, 1080
    eng, rt, cam = build_rt_scene(W, H)
    scene = eng.scene
    cm = cam.matrices
    instances = scene.flush()
    blasset, meta, anim_rest, anim_nodes = rt.accel.blas()
    slots, masks, table = rt._device_inputs(instances.capacity)
    ss = rt.accel.stack_size(instances.capacity)
    ctx = ACC.make_scene_tracer(
        blasset, meta, anim_rest, anim_nodes, instances,
        rt.accel.inst_blas(instances.capacity), masks, rt.accel.tri_attr(),
        slots, table, tlas_index=0, stack_size=ss,
        leaf_cutout=False, use_pallas=True, paged=False,
        textures=None, time=jnp.float32(0.0), animate=None, wide=True,
    )

    tiled = T.pick_tile(W, H)
    o, d = T.raygen(cm, W, H, tile_order=tiled)
    r = o.shape[0]
    tmax = jnp.full((r,), 1000.0)
    dead = jnp.zeros((r,), bool)

    t_dead = timeit(jax.jit(
        lambda: ctx.trace(o, d, tmax, active=dead).t))
    print(f"all-dead trace (fixed floor):   {t_dead:7.2f} ms "
          f"({t_dead / (r / 1024) * 1e3:.2f} us/packet)", flush=True)

    t_live = timeit(jax.jit(lambda: ctx.trace(o, d, tmax).t))
    print(f"primary trace (no resolve):     {t_live:7.2f} ms", flush=True)

    t_anyhit = timeit(jax.jit(
        lambda: ctx.trace(o, d, tmax, any_hit=True, active=dead).t))
    print(f"all-dead any-hit trace:         {t_anyhit:7.2f} ms", flush=True)

    # XLA-side ray build of one AO-like wave (basis + cosine sample + fold)
    surf = ctx.trace_resolve(o, d, tmax)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def ray_build():
        tx, ty = T._default_basis(surf.normal)
        r1, r2 = jax.random.uniform(jax.random.fold_in(key, 1000), (2, r))
        dd = T._cosine_sample(surf.normal, tx, ty, jnp.ones((r,)), r1, r2)
        return surf.world_pos + surf.normal * 1e-3, dd

    t_build = timeit(ray_build)
    print(f"AO ray build (XLA only):        {t_build:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
