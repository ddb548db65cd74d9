"""Measure (tile, group) pair counts vs triangle-group granularity G.

Decides the binned-raster redesign: how much tri-tile evaluation waste does
each granularity leave on the table for config 2?
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

from examples.render_dynamic import build_dynamic_scene
from paperrenderer_tpu.ops import raster as R
from paperrenderer_tpu.ops.static_batch import expand_static

W, H = 1920, 1080
TILE_W, TILE_H = 128, 8
n_tx, n_ty = W // TILE_W, H // TILE_H

eng, rp, cam = build_dynamic_scene(10000, W, H)
arrays = eng.begin_frame()
slots, visible, table = rp._device_inputs(arrays.capacity)
mapping = rp._current_mapping()
tables = eng.scene.tables()
cm = cam.matrices

batch, _ = jax.jit(lambda m, a, t, s, v: expand_static(m, a, t, cm, s, v))(
    mapping, arrays, tables, slots, visible)
coeffs, ok, (lo, hi) = jax.jit(
    lambda b: R.triangle_coefficients(b, W, H))(batch)

lo = jnp.where(ok[:, None], lo, jnp.inf)
hi = jnp.where(ok[:, None], hi, -jnp.inf)

print(f"valid tris: {int(ok.sum())} / {ok.shape[0]}")

for G in (1, 8, 16, 32, 64, 128):
    t = lo.shape[0]
    pad = (-t) % G
    glo = jnp.pad(lo, ((0, pad), (0, 0)), constant_values=jnp.inf)
    ghi = jnp.pad(hi, ((0, pad), (0, 0)), constant_values=-jnp.inf)
    glo = glo.reshape(-1, G, 2).min(axis=1)
    ghi = ghi.reshape(-1, G, 2).max(axis=1)
    tx0 = jnp.clip(jnp.floor(glo[:, 0] / TILE_W), 0, n_tx - 1)
    tx1 = jnp.clip(jnp.floor(ghi[:, 0] / TILE_W), 0, n_tx - 1)
    ty0 = jnp.clip(jnp.floor(glo[:, 1] / TILE_H), 0, n_ty - 1)
    ty1 = jnp.clip(jnp.floor(ghi[:, 1] / TILE_H), 0, n_ty - 1)
    alive = jnp.isfinite(glo[:, 0])
    spans = jnp.where(alive, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0.0)
    pairs = float(spans.sum())
    evals = pairs * G
    print(f"G={G:4d}: groups={glo.shape[0]:7d} pairs={pairs:10.0f} "
          f"tri-tile evals={evals/1e6:8.2f}M  avg tiles/group={pairs/max(float(alive.sum()),1):.2f}")
