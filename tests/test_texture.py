"""Device texture sampling unit tests: kinds, addressing, filtering."""

import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten.flatten import _TextureBuilder
from pupiloptixlab_tpu.render.texture import sample_texture
from pupiloptixlab_tpu.render.vec import Vec2
from pupiloptixlab_tpu.scene.textures import (
    AddressMode,
    FilterMode,
    Texture,
    TextureType,
    checkerboard_texture,
    rgb_texture,
)
from pupiloptixlab_tpu.utils.math import Transform


def _table(*textures):
    b = _TextureBuilder()
    ids = [b.add(t) for t in textures]
    return b.build(), ids


def _uv(pts):
    a = jnp.asarray(pts, jnp.float32)
    return Vec2(a[:, 0], a[:, 1])


def _rgb_np(v):
    return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], -1)


def test_rgb_passthrough():
    table, (i,) = _table(rgb_texture(0.2, 0.4, 0.8))
    out = sample_texture(table, jnp.zeros(4, jnp.int32) + i, _uv([[0, 0]] * 4))
    np.testing.assert_allclose(_rgb_np(out), [[0.2, 0.4, 0.8]] * 4, rtol=1e-6)


def test_checkerboard_quadrants():
    tex = checkerboard_texture((1, 1, 1), (0, 0, 0))  # patch1=color0=white
    table, (i,) = _table(tex)
    uv = _uv([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    out = _rgb_np(sample_texture(table, jnp.zeros(4, jnp.int32) + i, uv))
    # reference logic: same-half -> patch1 (cuda/texture.h:46-50)
    np.testing.assert_allclose(out[:, 0], [1, 0, 0, 1])


def test_checkerboard_uv_transform_scale():
    tex = checkerboard_texture((1, 1, 1), (0, 0, 0))
    tex.transform = Transform().scale(2.0, 2.0, 1.0)
    table, (i,) = _table(tex)
    # u=0.3 -> scaled 0.6 (> .5): flips vs unscaled
    out = _rgb_np(sample_texture(table, jnp.zeros(1, jnp.int32) + i, _uv([[0.3, 0.2]])))
    np.testing.assert_allclose(out[0, 0], 0.0)


def _bitmap(w=4, h=2, filter_mode=FilterMode.POINT, address=AddressMode.WRAP):
    data = np.zeros((h, w, 4), np.float32)
    data[..., 0] = np.arange(w)[None, :]  # red = column index
    data[..., 1] = np.arange(h)[:, None]  # green = row index
    t = Texture(type=TextureType.BITMAP, data=data,
                filter_mode=filter_mode, address_mode=address)
    return t


def test_bitmap_point_sampling():
    table, (i,) = _table(_bitmap())
    # texel centers: u = (x+0.5)/4, v = (y+0.5)/2
    uv = _uv([[(x + 0.5) / 4, (y + 0.5) / 2] for y in range(2) for x in range(4)])
    out = _rgb_np(sample_texture(table, jnp.zeros(8, jnp.int32) + i, uv))
    np.testing.assert_allclose(out[:, 0], [0, 1, 2, 3, 0, 1, 2, 3])
    np.testing.assert_allclose(out[:, 1], [0, 0, 0, 0, 1, 1, 1, 1])


def test_bitmap_bilinear_midpoint():
    table, (i,) = _table(_bitmap(filter_mode=FilterMode.LINEAR))
    # halfway between texel 1 and 2 on row 0: red = 1.5
    uv = _uv([[0.5, 0.25]])
    out = _rgb_np(sample_texture(table, jnp.zeros(1, jnp.int32) + i, uv))
    np.testing.assert_allclose(out[0, 0], 1.5, atol=1e-5)


def test_bitmap_wrap_vs_clamp():
    t_wrap = _bitmap(address=AddressMode.WRAP)
    t_clamp = _bitmap(address=AddressMode.CLAMP)
    table, (iw, ic) = _table(t_wrap, t_clamp)
    uv = _uv([[1.125, 0.25]])  # u=1.125: wrap -> 0.125 (texel 0), clamp -> texel 3
    out_w = _rgb_np(sample_texture(table, jnp.zeros(1, jnp.int32) + iw, uv))
    out_c = _rgb_np(sample_texture(table, jnp.zeros(1, jnp.int32) + ic, uv))
    np.testing.assert_allclose(out_w[0, 0], 0.0)
    np.testing.assert_allclose(out_c[0, 0], 3.0)


def test_bitmap_mirror():
    t = _bitmap(address=AddressMode.MIRROR)
    table, (i,) = _table(t)
    uv = _uv([[1.125, 0.25]])  # mirror: 1.125 -> 0.875 -> texel 3
    out = _rgb_np(sample_texture(table, jnp.zeros(1, jnp.int32) + i, uv))
    np.testing.assert_allclose(out[0, 0], 3.0)


def test_mixed_kinds_in_one_table():
    table, ids = _table(
        rgb_texture(0.5), checkerboard_texture((1, 0, 0), (0, 1, 0)), _bitmap()
    )
    tex_id = jnp.asarray(ids, jnp.int32)
    uv = _uv([[0.25, 0.25]] * 3)
    out = _rgb_np(sample_texture(table, tex_id, uv))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(out[1], [1, 0, 0])  # same-half -> patch1
    np.testing.assert_allclose(out[2, 0], 1.0)  # texel col 1
