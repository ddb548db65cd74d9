"""Dissect config-5's expand + resolve stages (round-4 VERDICT #7).

Each sub-stage is its own jitted fn with device arrays passed as ARGUMENTS
(constants cost ~2-5 ms/call on axon — CLAUDE.md).

Usage: python scripts/prof_expand.py [--n 100000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=8, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100000)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from examples.render_dynamic import build_dynamic_scene
    from paperrenderer_tpu.core.transforms import trs_to_mat34
    from paperrenderer_tpu.ops import static_batch as SB
    from paperrenderer_tpu.ops.preprocess import frustum_cull, select_lod

    eng, rp, cam = build_dynamic_scene(args.n, args.width, args.height)
    scene = eng.scene
    instances = scene.flush()
    mapping = rp._current_mapping()
    tables = scene.tables()
    camera = cam.matrices
    slots = rp._slot_material_array(instances.capacity)

    print(f"capacity={mapping.capacity} runs={mapping.run_inst.shape[0]} "
          f"max_run={mapping.max_run}")

    # (1) per-instance math (matrices+cull+lod)
    def inst_math(mapping, instances):
        model_id = jnp.maximum(instances.model_id, 0)
        m = trs_to_mat34(instances.pos, instances.scale, instances.quat)
        lo = tables.model_aabb_min[model_id]
        hi = tables.model_aabb_max[model_id]
        vis = instances.alive & frustum_cull(lo, hi, m, camera)
        lod = select_lod(instances.pos, lo, hi,
                         tables.model_lod_count[model_id], camera.cam_pos)
        return m, vis, lod

    print(f"inst math: {timeit(jax.jit(inst_math), mapping, instances):.2f} ms", flush=True)
    m, vis, lod = jax.jit(inst_math)(mapping, instances)

    # (2) seed gather + fill-forward -> [14, T]
    def fill(mapping, m, vis, lod, slots):
        ri = mapping.run_inst
        inst_vals = jnp.concatenate(
            [m.reshape(-1, 12), vis.astype(jnp.float32)[:, None],
             lod.astype(jnp.float32)[:, None],
             slots.astype(jnp.float32)], axis=-1)
        rows = inst_vals[ri]
        m12_runs = rows[:, :12]
        run_ok = ((rows[:, 12] > 0.5)
                  & (rows[:, 13] == mapping.run_lod.astype(jnp.float32))
                  ).astype(jnp.float32)
        mat_runs = rows[:, 14]
        seed = jnp.concatenate(
            [m12_runs, run_ok[:, None], mat_runs[:, None]], axis=-1)
        t_cap = mapping.capacity
        vals = jnp.zeros((14, t_cap), jnp.float32).at[
            :, mapping.run_starts].set(seed.T, mode="drop")
        filled = mapping.start_mask
        seg = mapping.run_id
        k = 1
        while k < mapping.max_run:
            pad_v = jnp.zeros((14, k), jnp.float32)
            pad_b = jnp.zeros((k,), bool)
            pad_s = jnp.full((k,), -2, jnp.int32)
            sv = jnp.concatenate([pad_v, vals[:, :-k]], axis=1)
            sf = jnp.concatenate([pad_b, filled[:-k]], axis=0)
            ss = jnp.concatenate([pad_s, seg[:-k]], axis=0)
            take = (~filled) & sf & (ss == seg)
            vals = jnp.where(take[None, :], sv, vals)
            filled = filled | take
            k *= 2
        return vals

    jf = jax.jit(fill)
    print(f"seed+fill-forward: {timeit(jf, mapping, m, vis, lod, slots):.2f} ms", flush=True)
    vals = jf(mapping, m, vis, lod, slots)

    # (3) finish (dense transform + clip)
    def finish(mapping, vals):
        m12 = vals[:12]
        tri_valid = mapping.valid & (vals[12] > 0.5)
        material = vals[13].astype(jnp.int32)
        return SB._finish_expand(mapping, camera, mapping.v_obj, m12,
                                 material, tri_valid)

    jfin = jax.jit(finish)
    print(f"finish (transform+clip): {timeit(jfin, mapping, vals):.2f} ms", flush=True)
    batch = jfin(mapping, vals)

    # (4) full expand for calibration
    je = jax.jit(lambda mapping, instances, slots: SB.expand_static(
        mapping, instances, tables, camera, slots))
    print(f"full expand: {timeit(je, mapping, instances, slots):.2f} ms", flush=True)

    # (5) coefficients
    from paperrenderer_tpu.ops.raster import triangle_coefficients
    from paperrenderer_tpu.core.material import MaterialTable

    batch2, _ = je(mapping, instances, slots)
    jc = jax.jit(lambda b: triangle_coefficients(b, args.width, args.height))
    print(f"coeffs: {timeit(jc, batch2):.2f} ms", flush=True)

    # (6) resolve attr gather variants
    from paperrenderer_tpu.ops.raster_exact import (
        pack_attr_coef, resolve_gbuffer_pairs)

    coeffs, okc, _ = jc(batch2)
    table = pack_attr_coef(batch2, coeffs)
    tp = table.shape[0]
    tp_pad = -(-tp // 4) * 4
    table = jnp.pad(table, ((0, tp_pad - tp), (0, 0)))
    h, w = args.height, args.width
    key = jax.random.PRNGKey(0)
    tid = jax.random.randint(key, (h, w), 0, tp)   # worst-case random ids
    depth = jnp.full((h, w), 0.5, jnp.float32)

    jr = jax.jit(lambda t, d, i: resolve_gbuffer_pairs(t, d, i, camera))
    print(f"resolve (random tids): {timeit(jr, table, depth, tid):.2f} ms", flush=True)

    # coherent tids (screen-sorted winner ids — measures gather locality)
    tid2 = jnp.sort(tid.reshape(-1)).reshape(h, w)
    print(f"resolve (sorted tids): {timeit(jr, table, depth, tid2):.2f} ms")


if __name__ == "__main__":
    main()
