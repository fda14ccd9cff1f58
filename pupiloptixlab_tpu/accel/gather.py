"""Fast row gathers from small tables — the texture/SBT-fetch replacement.

XLA's native TPU gather fetches rows element-by-element (~3 ms per (2M,)
lookup); a scene render does dozens per bounce. For the small dense tables
this framework uses (triangle attributes, materials, textures, emitters),
a gather is better expressed as a one-hot matmul on the MXU. The Pallas
kernel builds the one-hot mask tile-by-tile in VMEM (so the (N, T) mask
never touches HBM) and contracts it against the VMEM-resident table.

``gather_cols`` returns the transposed (C, N) layout: each attribute is a
dense (N,) plane (full lane utilization — see render/vec.py), which is
what the plane-structured shading code consumes. ``gather_rows`` keeps
the (N, C) convention for row-oriented callers.

Out-of-range indices clamp to row 0 (callers mask invalid lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 4096
_MAX_PALLAS_ROWS = 2048  # table bigger than this -> XLA gather
_MAX_PALLAS_COLS = 512


def _gather_cols_kernel(idx_ref, table_t_ref, out_ref):
    idx = idx_ref[:]  # (1, B) i32
    t = table_t_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, idx.shape[1]), 0)
    one_hot = (rows == idx).astype(jnp.bfloat16)  # (T, B)
    out_ref[:] = jnp.dot(
        table_t_ref[:].astype(jnp.bfloat16), one_hot,
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_cols_pallas(table_t: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    n = idx.shape[0]
    c, t = table_t.shape
    pad = (-n) % _BLOCK
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros(pad, idx.dtype)], 0)
    idx2 = jnp.clip(idx, 0, t - 1).astype(jnp.int32)[None, :]
    out = pl.pallas_call(
        _gather_cols_kernel,
        grid=((n + pad) // _BLOCK,),
        in_specs=[
            pl.BlockSpec((1, _BLOCK), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, t), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, _BLOCK), lambda r: (0, r), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n + pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + pad) * t * c,
            bytes_accessed=(n + pad) * (4 + 4 * c) + t * c * 4,
            transcendentals=0,
        ),
    )(idx2, table_t)
    return out[:, :n]


def gather_cols(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (T, C) f32, idx (N,) int -> (C, N) f32 = table[idx].T.

    One-hot weights are exact in bf16, so values reproduce bit-for-bit.
    """
    t, c = table.shape
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or t > _MAX_PALLAS_ROWS or c > _MAX_PALLAS_COLS:
        return table[jnp.clip(idx, 0, t - 1)].T
    return _gather_cols_pallas(table.T, idx)


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (T, C) f32, idx (N,) int -> (N, C) f32 = table[idx]."""
    t, c = table.shape
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or t > _MAX_PALLAS_ROWS or c > _MAX_PALLAS_COLS:
        return table[jnp.clip(idx, 0, t - 1)]
    return _gather_cols_pallas(table.T, idx).T
