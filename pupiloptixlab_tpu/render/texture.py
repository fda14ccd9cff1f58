"""Device texture sampling over the dense TextureTable.

The TPU has no texture units; sampling is software gathers. Descriptor
fetch is one packed-row gather (one-hot matmul, accel/gather.py); only
actual bitmap pixel fetches touch the pool. Semantics parity:
cuda::Texture::Sample (cuda/texture.h:33-57) — uv transform applied as
[u,v,0,1] through two transform rows, RGB passthrough, the reference's
exact checkerboard fract logic, and bitmap fetch with wrap/clamp/mirror
addressing and point/bilinear filtering.

``kinds`` specializes the emitted program to the texture kinds present in
the scene (RenderConfig.tex_kinds): an RGB-only scene compiles to a
single table gather with no pool traffic.
"""

from __future__ import annotations

import jax.numpy as jnp

from pupiloptixlab_tpu.accel.gather import gather_rows
from pupiloptixlab_tpu.flatten.types import (
    TEX_ADDRESS,
    TEX_FILTER,
    TEX_H,
    TEX_KIND,
    TEX_OFFSET,
    TEX_PATCH2,
    TEX_RGB,
    TEX_UVT,
    TEX_W,
    TextureTable,
)

ALL_KINDS = (0, 1, 2)  # rgb, checkerboard, bitmap


def _address(coord, mode):
    """Normalized-coordinate addressing: 0 wrap, 1 clamp, 2 mirror."""
    wrapped = coord - jnp.floor(coord)
    clamped = jnp.clip(coord, 0.0, 1.0)
    m = coord - 2.0 * jnp.floor(coord * 0.5)  # period-2 sawtooth in [0,2)
    mirrored = jnp.where(m > 1.0, 2.0 - m, m)
    return jnp.where(mode == 0, wrapped, jnp.where(mode == 1, clamped, mirrored))


def _fetch(pool, offset, w, h, ix, iy):
    ix = jnp.clip(ix, 0, jnp.maximum(w - 1, 0))
    iy = jnp.clip(iy, 0, jnp.maximum(h - 1, 0))
    return pool[offset + iy * w + ix]


def sample_texture_rows(
    rows: jnp.ndarray,
    pool: jnp.ndarray,
    uv: jnp.ndarray,
    kinds: tuple[int, ...] = ALL_KINDS,
) -> jnp.ndarray:
    """Sample from pre-gathered packed descriptor rows (N, TEX_COLS)."""
    rgb = rows[:, TEX_RGB]
    if tuple(kinds) == (0,):
        return rgb  # constant-color-only scene

    kind = rows[:, TEX_KIND]
    uvt = rows[:, TEX_UVT]
    u = uvt[:, 0] * uv[:, 0] + uvt[:, 1] * uv[:, 1] + uvt[:, 2]
    v = uvt[:, 3] * uv[:, 0] + uvt[:, 4] * uv[:, 1] + uvt[:, 5]

    out = rgb
    if 1 in kinds:
        # checkerboard (cuda/texture.h:42-50): truncate toward 0, wrap
        fu = u - jnp.where(u > 0.0, jnp.floor(u), jnp.ceil(u))
        fv = v - jnp.where(v > 0.0, jnp.floor(v), jnp.ceil(v))
        fu = jnp.where(fu < 0.0, fu + 1.0, fu)
        fv = jnp.where(fv < 0.0, fv + 1.0, fv)
        checker = jnp.where(
            ((fu > 0.5) == (fv > 0.5))[:, None], rgb, rows[:, TEX_PATCH2]
        )
        out = jnp.where((kind == 1.0)[:, None], checker, out)

    if 2 in kinds:
        w = rows[:, TEX_W]
        h = rows[:, TEX_H]
        mode = rows[:, TEX_ADDRESS]
        offset = rows[:, TEX_OFFSET].astype(jnp.int32)
        au = _address(u, mode)
        av = _address(v, mode)
        wf = jnp.maximum(w, 1.0)
        hf = jnp.maximum(h, 1.0)
        wi = wf.astype(jnp.int32)
        hi = hf.astype(jnp.int32)

        ix = jnp.floor(au * wf).astype(jnp.int32)
        iy = jnp.floor(av * hf).astype(jnp.int32)
        point = _fetch(pool, offset, wi, hi, ix, iy)

        x = au * wf - 0.5
        y = av * hf - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        c00 = _fetch(pool, offset, wi, hi, x0i, y0i)
        c10 = _fetch(pool, offset, wi, hi, x0i + 1, y0i)
        c01 = _fetch(pool, offset, wi, hi, x0i, y0i + 1)
        c11 = _fetch(pool, offset, wi, hi, x0i + 1, y0i + 1)
        linear = (
            c00 * (1 - fx) * (1 - fy)
            + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy
            + c11 * fx * fy
        )
        bitmap = jnp.where((rows[:, TEX_FILTER] == 1.0)[:, None], linear, point)
        out = jnp.where((kind == 2.0)[:, None], bitmap, out)

    return out


def sample_texture(
    tex: TextureTable,
    tex_id: jnp.ndarray,
    uv: jnp.ndarray,
    kinds: tuple[int, ...] = ALL_KINDS,
) -> jnp.ndarray:
    """Sample texture ``tex_id`` (N,) at ``uv`` (N,2) -> (N,3) linear rgb."""
    rows = gather_rows(tex.packed, tex_id)
    return sample_texture_rows(rows, tex.pool, uv, kinds)
