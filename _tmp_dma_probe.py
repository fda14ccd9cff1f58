"""Probe: can Mosaic DMA a narrow-minor HBM slice (tcl, C) with C < 128
into VMEM scratch inside a while_loop?  Tries C in {12, 16, 32} plus the
current padded-128 baseline; prints which compile+run and per-copy rough
timing at frame scale."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TCL = 32
T = 4096  # rows


def make_probe(cols: int, n_iters: int):
    def kernel(tri_ref, out_ref, buf, sem):
        out_ref[:] = jnp.zeros_like(out_ref[:])

        def body(c):
            i, acc = c
            start = (i * TCL) % (T - TCL)
            start = pl.multiple_of((start // TCL) * TCL, TCL)
            cp = pltpu.make_async_copy(
                tri_ref.at[pl.ds(start, TCL), :],
                buf.at[:, :],
                sem,
            )
            cp.start()
            cp.wait()
            acc = acc + jnp.sum(buf[:, :], axis=0, keepdims=True)[0, 0]
            return (i + 1, acc)

        i, acc = jax.lax.while_loop(
            lambda c: c[0] < n_iters, body, (jnp.int32(0), jnp.float32(0.0))
        )
        out_ref[:] = out_ref[:] + acc

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TCL, cols), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return f


def run(cols, n_iters=20000):
    tri = jnp.asarray(np.random.rand(T, cols).astype(np.float32))
    f = jax.jit(make_probe(cols, n_iters))
    try:
        out = jax.block_until_ready(f(tri))
    except Exception as e:
        print(f"cols={cols}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(f(tri))
    dt = (time.perf_counter() - t0) / 3
    ns_per = dt / n_iters * 1e9
    print(f"cols={cols}: OK sum={float(out[0,0]):.1f} "
          f"{dt*1e3:.2f} ms total, {ns_per:.0f} ns/copy")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for c in (128, 12, 16, 32):
        run(c)
