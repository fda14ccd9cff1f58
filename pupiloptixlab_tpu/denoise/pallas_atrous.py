"""Pallas TPU kernel for the edge-avoiding a-trous filter.

The jnp formulation in ``atrous.py`` (pad + 25 static slices per
iteration) is HBM-bound on TPU: XLA materializes the shifted
weight/tap products, and the measured cost is ~67 ms per 5-iteration
denoise at 1080p (in-jit chain-slope method — see bench.py). This
kernel runs one a-trous iteration per ``pallas_call`` over
(row-stripe x column-tile) windows: each grid step DMAs a halo'd
window of the 9 input planes from HBM into one VMEM scratch, then
evaluates all 25 taps with static in-VMEM loads, so HBM sees ~3x the
image per iteration (vertical halo overdraw) instead of ~25x, and no
shifted intermediate ever round-trips.

Layout (the render/vec.py plane rule applied to images):
- 9 planes (color rgb, albedo rgb, normal rgb) pre-padded with EDGE
  values: HALO_V = 32 rows (max tap reach, 2 * 2^4) and HALO_W = 64
  cols (tap reach rounded up so every HBM window slice stays
  128-aligned in the minor dim — the Mosaic alignment rule).
- Window per grid step: (3R, Cb + 2*HALO_W) rows x cols, DMA'd with
  one async copy per plane (9 in flight, then waited — every started
  DMA is waited exactly once, the Mosaic pairing rule).
- Taps are static-offset loads from the scratch ref; the only
  materialized window is the luminance plane (computed once from the
  3 color windows).

Semantics match ``atrous.atrous_denoise`` exactly (same B3 weights,
sigma handling, integer-power normal weight); parity is pinned by
``tests/test_denoise.py`` in interpret mode. Reference role:
optix::Denoiser::Execute (optix/denoiser.cpp:171-267) — the device
filter the reference delegates to the closed OptiX AI denoiser.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.mosaic_params import ray_grid_params

_B3 = [1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0]

R = 32          # output rows per grid step (f32 sublane multiple)
HALO_V = 32     # vertical tap reach: 2 * step at step 16
HALO_W = 64     # horizontal halo, padded to keep window slices aligned
LANES = 128
MAX_CB = 512    # column-tile cap (Cb=1024 OOM'd scoped VMEM: 21 MB
                # with the unrolled 25-tap live set; 512 fits)


def _iter_kernel(step, npow_int, use_albedo, use_normal,
                 inv_2sc, inv_2sa, n_pow, cb,
                 *refs):
    planes = refs[:9]                      # HBM (ANY) padded planes
    out_r, out_g, out_b = refs[9:12]       # VMEM (R, cb) blocks
    scratch = refs[12]                     # VMEM (9, 3R, cb + 2*HALO_W)
    sems = refs[13]                        # DMA semaphores (9,)

    i = pl.program_id(0)
    c = pl.program_id(1)

    copies = [
        pltpu.make_async_copy(
            planes[j].at[
                pl.ds(i * R, 3 * R), pl.ds(c * cb, cb + 2 * HALO_W)
            ],
            scratch.at[j],
            sems.at[j],
        )
        for j in range(9)
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    # luminance window: the one materialized intermediate
    wlum = (
        0.2126 * scratch[0] + 0.7152 * scratch[1] + 0.0722 * scratch[2]
    )

    def load(j, y0, x0):
        return scratch[j, y0:y0 + R, x0:x0 + cb]

    def vslice(w, y0, x0):
        return jax.lax.slice(w, (y0, x0), (y0 + R, x0 + cb))

    cy, cx = R, HALO_W
    lum_c = vslice(wlum, cy, cx)
    ar_c, ag_c, ab_c = (load(j, cy, cx) for j in (3, 4, 5))
    nr_c, ng_c, nb_c = (load(j, cy, cx) for j in (6, 7, 8))

    acc_r = jnp.zeros((R, cb), jnp.float32)
    acc_g = jnp.zeros((R, cb), jnp.float32)
    acc_b = jnp.zeros((R, cb), jnp.float32)
    wsum = jnp.zeros((R, cb), jnp.float32)

    for iy in range(-2, 3):
        for ix in range(-2, 3):
            k = float(_B3[iy + 2] * _B3[ix + 2])
            y0 = R + iy * step
            x0 = HALO_W + ix * step

            dl = vslice(wlum, y0, x0) - lum_c
            wt = k * jnp.exp(-(dl * dl) * inv_2sc)
            if use_albedo:
                da = (
                    (load(3, y0, x0) - ar_c) ** 2
                    + (load(4, y0, x0) - ag_c) ** 2
                    + (load(5, y0, x0) - ab_c) ** 2
                )
                wt = wt * jnp.exp(-da * inv_2sa)
            if use_normal:
                ndot = jnp.clip(
                    load(6, y0, x0) * nr_c
                    + load(7, y0, x0) * ng_c
                    + load(8, y0, x0) * nb_c,
                    0.0, 1.0,
                )
                if npow_int:
                    y = ndot
                    for _ in range(npow_int - 1):
                        y = y * ndot
                    wt = wt * y
                else:
                    wt = wt * jnp.power(ndot, n_pow)
            acc_r = acc_r + load(0, y0, x0) * wt
            acc_g = acc_g + load(1, y0, x0) * wt
            acc_b = acc_b + load(2, y0, x0) * wt
            wsum = wsum + wt

    inv_w = 1.0 / jnp.maximum(wsum, 1e-8)
    out_r[:] = acc_r * inv_w
    out_g[:] = acc_g * inv_w
    out_b[:] = acc_b * inv_w


def _tile_width(w):
    """Column tiling: inner width (multiple of 128 covering w) split
    into nc tiles of cb <= MAX_CB, cb a lane multiple."""
    wi = ((w + LANES - 1) // LANES) * LANES
    nc = -(-wi // MAX_CB)
    cb = LANES * (-(-wi // (LANES * nc)))
    return cb, nc


def _pad_plane(p, h_pad, wi_pad):
    h, w = p.shape
    return jnp.pad(
        p,
        ((HALO_V, HALO_V + (h_pad - h)),
         (HALO_W, HALO_W + (wi_pad - w))),
        mode="edge",
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "use_albedo", "use_normal", "interpret",
        "sigma_color", "sigma_albedo", "sigma_normal",
    ),
)
def atrous_denoise_pallas(
    color, albedo, normal,
    iterations: int = 5,
    use_albedo: bool = True,
    use_normal: bool = True,
    sigma_color: float = 0.35,
    sigma_albedo: float = 0.15,
    sigma_normal: float = 0.25,
    interpret: bool = False,
):
    """Drop-in equivalent of atrous.atrous_denoise ((h, w, 3) in/out)."""
    h, w = color.shape[:2]
    h_pad = ((h + R - 1) // R) * R
    cb, nc = _tile_width(w)
    wi_pad = cb * nc
    grid = (h_pad // R, nc)

    inv_2sc = 1.0 / (2.0 * sigma_color**2)
    inv_2sa = 1.0 / (2.0 * sigma_albedo**2)
    n_pow = 1.0 / max(sigma_normal, 1e-3)
    npow_int = (
        int(round(n_pow))
        if abs(n_pow - round(n_pow)) < 1e-6 and 1 <= round(n_pow) <= 8
        else 0
    )

    guide_pads = [
        _pad_plane(x[..., ch], h_pad, wi_pad)
        for x in (albedo, normal)
        for ch in range(3)
    ]

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((R, cb), lambda i, c: (i, c),
                            memory_space=pltpu.VMEM)

    cr, cg, cb_ = (color[..., ch] for ch in range(3))
    for it in range(iterations):
        step = 1 << it
        col_pads = [_pad_plane(p, h_pad, wi_pad) for p in (cr, cg, cb_)]
        kernel = functools.partial(
            _iter_kernel, step, npow_int, use_albedo, use_normal,
            inv_2sc, inv_2sa, n_pow, cb,
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[any_spec] * 9,
            out_specs=[out_spec] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((h_pad, wi_pad), jnp.float32)
            ] * 3,
            scratch_shapes=[
                pltpu.VMEM((9, 3 * R, cb + 2 * HALO_W), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
            interpret=interpret,
            compiler_params=ray_grid_params(extra_parallel=1),
            cost_estimate=pl.CostEstimate(
                flops=25 * 40 * h_pad * wi_pad,
                bytes_accessed=12 * 4 * h_pad * wi_pad * 3,
                transcendentals=50 * h_pad * wi_pad,
            ),
        )(*(col_pads + guide_pads))
        cr, cg, cb_ = (o[:h, :w] for o in outs)
    return jnp.stack([cr, cg, cb_], axis=-1)
