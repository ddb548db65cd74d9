"""Packed row gathers: table[ids] at full DMA efficiency on TPU.

A per-element row gather from a [N, k] table DMAs one physical lane row
(512 B after T(8,128) lane padding) per element regardless of k — so a
k=1 table wastes 127/128 of every fetch, and XLA's 1-D scalar-gather path
is worse still (two f32[10001] per-pixel lookups measured 14.8 ms EACH at
1080p). Packing g = 128//k' consecutive rows into one physical row and
selecting the subrow with log2(g) halving selects makes the same lookup
~4 ms (the resolve_gbuffer_pairs 4-row trick, generalized).

Used by ops.shading.lookup_material_params and core.texture.select_rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pow2_ceil(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def gather_rows_packed(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``table[clip(ids, 0)]`` for a 2-D [N, k] table, k <= 128.

    Packs rows 128/k'-to-a-lane-row (k' = next power of two >= k), gathers
    one fully-used physical row per element, then selects the subrow by
    binary halving — log2(g) vector selects, each on a halving width.
    Exact for every dtype (unlike the one-hot-matmul fallback, which
    truncates f32 to bf16 at DEFAULT precision)."""
    n, k = table.shape
    assert k <= 128, "pack wider rows by the caller (or gather directly)"
    kp = _pow2_ceil(k)
    g = 128 // kp
    if g <= 1:
        return table[jnp.maximum(ids, 0)]
    npad = -(-n // g) * g
    t = jnp.pad(table, ((0, npad - n), (0, kp - k)))
    view = t.reshape(npad // g, 128)
    idx = jnp.maximum(ids, 0)
    rows = view[idx // g]                       # [..., 128]
    sub = idx % g
    width = 128
    bit = g >> 1
    while bit >= 1:
        width //= 2
        rows = jnp.where(
            ((sub & bit) != 0)[..., None], rows[..., width:], rows[..., :width]
        )
        bit >>= 1
    return rows[..., :k]
