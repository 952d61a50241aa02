"""Raw HBM->VMEM DMA bandwidth probe (the platform ceiling for paged decode).

Streams a large HBM buffer through VMEM with double-buffered async copies —
no compute — in chunk sizes matching the decode kernel's page DMAs. If this
tops out below the chip's nominal HBM bandwidth, that ceiling (not kernel
compute) bounds decode tokens/sec.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))


def _stream_kernel(x_ref, o_ref, buf, sems, *, nchunks, csize):
    def get(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(i * csize, csize)], buf.at[slot], sems.at[slot]
        )

    get(0, 0).start()

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < nchunks)
        def _():
            get(i + 1, 1 - slot).start()

        get(i, slot).wait()
        return acc + buf[slot, 0, 0].astype(jnp.float32)

    acc = jax.lax.fori_loop(0, nchunks, body, jnp.float32(0.0))
    o_ref[0, 0] = acc


def stream_sum(x, chunk_rows):
    """Reads all of x (rows, 128) via double-buffered DMA; returns a scalar."""
    rows = x.shape[0]
    nchunks = rows // chunk_rows
    kernel = functools.partial(
        _stream_kernel, nchunks=nchunks, csize=chunk_rows
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_rows, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x)


def main():
    mb = 256
    rows = mb * 1024 * 1024 // 256  # bf16, 128 lanes
    x = jnp.asarray(np.random.default_rng(0).standard_normal((rows, 128)), jnp.bfloat16)
    for chunk_kb in (128, 512, 2048):
        chunk_rows = chunk_kb * 1024 // 256
        def step(x, chunk_rows=chunk_rows):
            return stream_sum(x, chunk_rows)[0, 0][None].astype(x.dtype)

        # timed() chains scalar -> can't chain shape; time manually via many()
        @jax.jit
        def many(x):
            def body(c, _):
                return c + stream_sum(x, chunk_rows)[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
            return c

        float(many(x))
        t0 = time.time()
        float(many(x))
        dt = (time.time() - t0) / 10
        print(f"chunk {chunk_kb}KB: {mb/1024/dt:.1f} GB/s ({dt*1e3:.2f} ms / {mb}MB)")


if __name__ == "__main__":
    main()
