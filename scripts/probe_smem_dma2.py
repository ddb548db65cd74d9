"""Characterize HBM->SMEM DMA cost: latency vs bandwidth, overlap potential.

probe_smem_dma.py measured ~70 us per chained (start,wait,read) pair — far
above HBM latency. This probe separates:
  A. block-size dependence (is it latency- or bandwidth-bound?)
  B. double-buffered chains (start k+1 before waiting k) — how much hides?
  C. HBM->VMEM for reference
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NC = 64
N_ITERS = 256


def run_case(blk, mode):
    def kernel(hbm_f, order_ref, out_ref, s2, sem):
        def chained(k, acc):
            c = order_ref[k]
            d = pltpu.make_async_copy(
                hbm_f.at[pl.ds(c * blk, blk)], s2.at[pl.ds(0, blk)], sem.at[0])
            d.start()
            d.wait()
            return acc + s2[0]

        def dbuf(k, acc):
            # start next into the other slot, then wait current
            c_next = order_ref[k + 1]
            cur = k % 2
            nxt = 1 - cur
            dn = pltpu.make_async_copy(
                hbm_f.at[pl.ds(c_next * blk, blk)], s2.at[pl.ds(nxt * blk, blk)], sem.at[nxt])
            dn.start()
            dw = pltpu.make_async_copy(
                hbm_f.at[pl.ds(order_ref[k] * blk, blk)],
                s2.at[pl.ds(cur * blk, blk)], sem.at[cur])
            dw.wait()
            return acc + s2[cur * blk]

        if mode == "chained":
            acc = jax.lax.fori_loop(0, N_ITERS, chained, jnp.float32(0.0))
        else:
            d0 = pltpu.make_async_copy(
                hbm_f.at[pl.ds(order_ref[0] * blk, blk)],
                s2.at[pl.ds(0, blk)], sem.at[0])
            d0.start()
            acc = jax.lax.fori_loop(0, N_ITERS - 1, dbuf, jnp.float32(0.0))
        out_ref[0] = acc

    hf = jnp.arange(NC * blk, dtype=jnp.float32) * 0.001
    order = jnp.asarray(
        np.random.default_rng(0).integers(0, NC, N_ITERS + 1), jnp.int32)
    fn = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2 * blk,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = fn(hf, order)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(hf, order)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    print(f"blk={blk*4//1024:4d}KiB mode={mode:8s}: "
          f"{dt/N_ITERS*1e6:7.2f} us/iter")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for blk in (1024, 2048, 6144, 24576):
        run_case(blk, "chained")
    for blk in (6144,):
        run_case(blk, "dbuf")
    # NOTE: timings are only valid with an otherwise-idle TPU tunnel —
    # a concurrent process inflated these 200x once (0.3 us -> 70 us).
