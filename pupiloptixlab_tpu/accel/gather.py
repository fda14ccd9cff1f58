"""Fast row gathers from small tables — the texture/SBT-fetch replacement.

XLA's native TPU gather fetches rows element-by-element (~3 ms per (2M,)
lookup); a scene render does dozens per bounce. For the small dense tables
this framework uses (triangle attributes, materials, textures, emitters),
a gather is better expressed as a one-hot matmul on the MXU. This module
provides a Pallas kernel that builds the one-hot mask tile-by-tile in
VMEM (so the (N, T) mask never touches HBM) and contracts it against the
VMEM-resident table, plus a plain-XLA fallback for big tables and CPU.

Row counts are padded to sublane multiples; out-of-range indices clamp to
row 0 (callers mask invalid lanes themselves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 1024
_MAX_PALLAS_ROWS = 2048  # table bigger than this -> XLA gather
_MAX_PALLAS_COLS = 512


def _gather_kernel(idx_ref, table_ref, out_ref):
    idx = idx_ref[:]  # (B, 1) i32
    t = table_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], t), 1)
    one_hot = (rows == idx).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(
        one_hot, table_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_pallas(table: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    n = idx.shape[0]
    t, c = table.shape
    pad = (-n) % _BLOCK
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros(pad, idx.dtype)], 0)
    idx2 = jnp.clip(idx, 0, t - 1).astype(jnp.int32)[:, None]
    out = pl.pallas_call(
        _gather_kernel,
        grid=((n + pad) // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 1), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad, c), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + pad) * t * c,
            bytes_accessed=(n + pad) * (4 + 4 * c) + t * c * 4,
            transcendentals=0,
        ),
    )(idx2, table)
    return out[:n]


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (T, C) f32, idx (N,) int -> (N, C) f32 = table[idx].

    Values must survive a bf16-weighted f32 contraction exactly: the
    one-hot weights are exact in bf16 so the result equals the gathered
    rows bit-for-bit.
    """
    t, c = table.shape
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or t > _MAX_PALLAS_ROWS or c > _MAX_PALLAS_COLS:
        return table[jnp.clip(idx, 0, t - 1)]
    return _gather_pallas(table, idx)
