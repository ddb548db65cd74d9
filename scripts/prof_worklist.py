"""Isolate: work-list build (JAX prologue) vs Pallas kernel in the binned
rasterizer, plus scatter/cumsum/gather microbenchmarks at raster scales."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")


def timeit(fn, args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


from examples.render_dynamic import build_dynamic_scene
from paperrenderer_tpu.ops import raster as R
from paperrenderer_tpu.ops.static_batch import expand_static

W, H = 1920, 1080
eng, rp, cam = build_dynamic_scene(10000, W, H)
arrays = eng.begin_frame()
slots, visible, table = rp._device_inputs(arrays.capacity)
mapping = rp._current_mapping()
tables = eng.scene.tables()
cm = cam.matrices
_ldr, aux = rp.render(cam)
work_cap = rp._work_capacity

batch, _ = jax.jit(lambda m, a, t, s, v: expand_static(m, a, t, cm, s, v))(
    mapping, arrays, tables, slots, visible)

# --- worklist-only: replicate rasterize_tiles_binned's prologue -------------
from paperrenderer_tpu.ops.raster_pallas import CHUNK_B, TILE_H, TILE_W


@jax.jit
def s_worklist(batch):
    coeffs, ok, (lo, hi) = R.triangle_coefficients(batch, W, H)
    t = batch.capacity
    n_chunks = -(-t // CHUNK_B)
    t_pad = n_chunks * CHUNK_B
    cf = jnp.pad(coeffs.reshape(t, 15), ((0, t_pad - t), (0, 1)))
    n_ty, n_tx = H // TILE_H, W // TILE_W
    n_tiles = n_ty * n_tx
    chunk_lo = jnp.where(ok[:, None], lo, jnp.inf)
    chunk_hi = jnp.where(ok[:, None], hi, -jnp.inf)
    cl = chunk_lo.reshape(n_chunks, CHUNK_B, 2).min(axis=1)
    ch = chunk_hi.reshape(n_chunks, CHUNK_B, 2).max(axis=1)
    ty_idx = jnp.arange(n_tiles, dtype=jnp.int32) // n_tx
    tx_idx = jnp.arange(n_tiles, dtype=jnp.int32) % n_tx
    tx0 = tx_idx.astype(jnp.float32) * TILE_W
    ty0 = ty_idx.astype(jnp.float32) * TILE_H
    ovl = (
        (cl[None, :, 0] <= tx0[:, None] + TILE_W)
        & (ch[None, :, 0] >= tx0[:, None])
        & (cl[None, :, 1] <= ty0[:, None] + TILE_H)
        & (ch[None, :, 1] >= ty0[:, None])
    )
    flat = ovl.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    required = n_tiles + pos[-1] + 1
    PAGE = 12288
    w_cap = max(work_cap or (n_tiles + 8 * n_chunks), n_tiles + 1)
    n_pages = -(-w_cap // PAGE)
    w_pad = n_pages * PAGE
    tile_of = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None], (n_tiles, n_chunks)
    ).reshape(-1)
    chunk_of = jnp.broadcast_to(
        jnp.arange(n_chunks, dtype=jnp.int32)[None, :], (n_tiles, n_chunks)
    ).reshape(-1)
    write = jnp.where(flat, n_tiles + pos, w_pad)
    slot = jnp.arange(w_pad, dtype=jnp.int32)
    seed_init_tile = jnp.where(slot < n_tiles, slot, n_tiles - 1)
    seed_init_chunk = jnp.where(slot < n_tiles, -1, -2)
    work_tile = seed_init_tile.at[write].set(tile_of, mode="drop")
    work_chunk = seed_init_chunk.at[write].set(chunk_of, mode="drop")
    return work_tile, work_chunk, cf, required


ms, _ = timeit(s_worklist, (batch,), 5)
print(f"worklist build (incl coeffs)  {ms:8.2f} ms", flush=True)

# --- microbenches ------------------------------------------------------------
key = jax.random.PRNGKey(0)

for n in (546_000, 2_073_600, 8_300_000):
    src = jax.random.normal(key, (n,))
    idx = jax.random.randint(key, (n,), 0, n).astype(jnp.int32)

    @jax.jit
    def s_scatter(idx, src):
        return jnp.zeros((n,), jnp.float32).at[idx].set(src, mode="drop")

    ms, _ = timeit(s_scatter, (idx, src), 5)
    print(f"scatter 1D n={n:9d}          {ms:8.2f} ms ({ms*1e6/n:.1f} ns/elem)", flush=True)

    @jax.jit
    def s_cumsum(src):
        return jnp.cumsum(src)

    ms, _ = timeit(s_cumsum, (src,), 5)
    print(f"cumsum  1D n={n:9d}          {ms:8.2f} ms", flush=True)

# row gather [L, 16]
tbl = jax.random.normal(key, (524288, 16))
for L in (546_000,):
    idx = jax.random.randint(key, (L,), 0, 524288).astype(jnp.int32)

    @jax.jit
    def s_rowgather(tbl, idx):
        return tbl[idx]

    ms, _ = timeit(s_rowgather, (tbl, idx), 5)
    print(f"row gather [{L}, 16]         {ms:8.2f} ms ({ms*1e6/L:.1f} ns/row)", flush=True)

# argsort / sort of pair keys
for L in (600_000,):
    keys = jax.random.randint(key, (L,), 0, 2025).astype(jnp.int32)

    @jax.jit
    def s_argsort(keys):
        return jnp.argsort(keys)

    ms, _ = timeit(s_argsort, (keys,), 3)
    print(f"argsort n={L}                {ms:8.2f} ms", flush=True)
