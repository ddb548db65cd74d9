"""Packed row gathers (ops/gather.py) + the lookup paths built on them.

The packing trick must be EXACT for every dtype and table shape — it
replaces one-hot matmuls whose DEFAULT-precision bf16 truncation rounded
address-like values (round-2 advisor finding on texture rects).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paperrenderer_tpu.core.material import MaterialTable
from paperrenderer_tpu.core.texture import select_rows
from paperrenderer_tpu.ops.gather import gather_rows_packed
from paperrenderer_tpu.ops.shading import (
    lookup_material_params, lookup_texture_ids,
)


@pytest.mark.parametrize("n,k", [(100, 1), (100, 3), (200, 4), (77, 5),
                                 (129, 32), (65, 128), (16, 8), (1, 1)])
def test_gather_rows_packed_exact(n, k):
    rng = np.random.default_rng(n * 1000 + k)
    # address-like values: large integers that bf16 would round
    t = jnp.asarray(rng.integers(0, 1 << 20, size=(n, k)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n, size=(37,)), jnp.int32)
    got = jax.jit(gather_rows_packed)(t, ids)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(t)[np.asarray(ids)])


def test_gather_rows_packed_int_dtype():
    rng = np.random.default_rng(3)
    t = jnp.asarray(rng.integers(-5, 1 << 24, size=(90, 4)), jnp.int32)
    ids = jnp.asarray(rng.integers(0, 90, size=(8, 9)), jnp.int32)
    got = jax.jit(gather_rows_packed)(t, ids)
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(t)[np.asarray(ids)])


def test_gather_rows_packed_negative_ids_clamp():
    t = jnp.asarray(np.arange(50 * 2, dtype=np.float32).reshape(50, 2))
    ids = jnp.asarray([-1, -7, 0, 49], jnp.int32)
    got = jax.jit(gather_rows_packed)(t, ids)
    exp = np.asarray(t)[np.maximum(np.asarray(ids), 0)]
    np.testing.assert_array_equal(np.asarray(got), exp)


@pytest.mark.parametrize("n", [3, 64, 65, 200])   # select path + gather path
def test_select_rows_matches_numpy(n):
    rng = np.random.default_rng(n)
    for shape in [(n,), (n, 1), (n, 4), (n, 130)]:
        t = jnp.asarray(rng.integers(0, 1 << 20, size=shape), jnp.float32)
        ids = jnp.asarray(rng.integers(0, n, size=(23,)), jnp.int32)
        got = jax.jit(select_rows)(t, ids)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(t)[np.asarray(ids)])


def _table(m, rng):
    return MaterialTable(
        albedo=jnp.asarray(rng.uniform(size=(m, 3)), jnp.float32),
        emissive=jnp.asarray(rng.uniform(size=(m, 3)), jnp.float32),
        roughness=jnp.asarray(rng.uniform(size=m), jnp.float32),
        metallic=jnp.asarray(rng.uniform(size=m), jnp.float32),
        alpha=jnp.ones(m), shading_model=jnp.zeros(m, jnp.int32),
        cull_back=jnp.zeros(m, bool),
        base_tex=jnp.asarray(rng.integers(-1, 5, size=m), jnp.int32),
        emissive_tex=jnp.asarray(rng.integers(-1, 5, size=m), jnp.int32),
        mr_tex=jnp.asarray(rng.integers(-1, 5, size=m), jnp.int32),
        occ_tex=jnp.asarray(rng.integers(-1, 5, size=m), jnp.int32))


@pytest.mark.parametrize("m", [4, 33, 150])   # select / one-hot / packed
def test_lookup_material_params_all_strategies(m):
    rng = np.random.default_rng(m)
    tbl = _table(m, rng)
    ids = jnp.asarray(rng.integers(0, m, size=(7, 11)), jnp.int32)
    a, e, r, mt = jax.jit(lookup_material_params)(tbl, ids)
    idn = np.asarray(ids)
    atol = 0.01 if m == 33 else 0.0   # one-hot matmul path is bf16
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(tbl.albedo)[idn], atol=atol)
    np.testing.assert_allclose(np.asarray(e),
                               np.asarray(tbl.emissive)[idn], atol=atol)
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray(tbl.roughness)[idn], atol=atol)
    np.testing.assert_allclose(np.asarray(mt),
                               np.asarray(tbl.metallic)[idn], atol=atol)


@pytest.mark.parametrize("m", [4, 150])
def test_lookup_texture_ids(m):
    rng = np.random.default_rng(m + 7)
    tbl = _table(m, rng)
    ids = jnp.asarray(rng.integers(0, m, size=(13,)), jnp.int32)
    b, e, mr, oc = jax.jit(lookup_texture_ids)(tbl, ids)
    idn = np.asarray(ids)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(tbl.base_tex)[idn])
    np.testing.assert_array_equal(np.asarray(e),
                                  np.asarray(tbl.emissive_tex)[idn])
    np.testing.assert_array_equal(np.asarray(mr), np.asarray(tbl.mr_tex)[idn])
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(tbl.occ_tex)[idn])
