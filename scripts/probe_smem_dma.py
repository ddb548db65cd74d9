"""Feasibility probe: in-kernel async DMA HBM -> SMEM on this TPU.

The paged packet traversal (ops/trace_kernel paging, VERDICT r3 item 2)
needs to stream TLAS chunk blocks from HBM into SMEM scratch inside the
kernel, gated on a traced chunk id. This probe checks Mosaic supports:
  * pltpu.ANY input refs sliced with .at[i] (traced i) as DMA source
  * SMEM scratch as DMA destination (f32 and i32)
  * DMA inside a lax.while_loop body under pl.when
and measures the per-DMA latency for a ~28 KiB block.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NC = 64            # chunks
BLK = 6144         # f32 per block (24 KiB)
IBLK = 1024        # i32 per block


def kernel(hbm_f, hbm_i, order_ref, out_ref, scratch_f, scratch_i, sem_f, sem_i):
    n = order_ref.shape[0]

    def body(k, acc):
        c = order_ref[k]
        df = pltpu.make_async_copy(
            hbm_f.at[pl.ds(c * BLK, BLK)], scratch_f, sem_f)
        di = pltpu.make_async_copy(
            hbm_i.at[pl.ds(c * IBLK, IBLK)], scratch_i, sem_i)
        df.start()
        di.start()
        df.wait()
        di.wait()
        return acc + scratch_f[0] + scratch_f[BLK - 1] \
            + scratch_i[0].astype(jnp.float32)

    acc = jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    out_ref[0] = acc


def main():
    print("backend:", jax.default_backend())
    hf = jnp.arange(NC * BLK, dtype=jnp.float32) * 0.001
    hi = (jnp.tile(jnp.arange(IBLK, dtype=jnp.int32)[None], (NC, 1))
          + jnp.arange(NC, dtype=jnp.int32)[:, None] * 1000).reshape(-1)
    order = jnp.asarray(np.random.default_rng(0).integers(0, NC, 256),
                        jnp.int32)

    fn = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((BLK,), jnp.float32),
            pltpu.SMEM((IBLK,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = fn(hf, hi, order)
    out.block_until_ready()

    # expected value on host
    exp = 0.0
    hfn = np.asarray(hf).reshape(NC, BLK)
    hin = np.asarray(hi).reshape(NC, IBLK)
    for c in np.asarray(order):
        exp += hfn[c, 0] + hfn[c, BLK - 1] + float(hin[c, 0])
    print("kernel:", float(out[0]), "expected:", exp,
          "match:", np.isclose(float(out[0]), exp, rtol=1e-5))

    for reps in (3,):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(hf, hi, order)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"256 chained DMA pairs: {dt*1e6:.1f} us total, "
              f"{dt/256*1e6:.2f} us per (24KiB f32 + 4KiB i32) pair")


if __name__ == "__main__":
    main()
