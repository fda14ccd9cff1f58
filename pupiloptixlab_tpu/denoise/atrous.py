"""JAX-native denoiser: edge-avoiding a-trous wavelet filtering.

Replaces the OptiX AI denoiser wrapper (optix/denoiser.{h,cpp}) with an
SVGF-style guided filter built from pure jnp ops (fully fused by XLA; no
trained weights needed). API parity with optix::Denoiser:

* mode bitfield {USE_ALBEDO, USE_NORMAL, TEMPORAL, UPSCALE_2X, TILED}
  (denoiser.h:9-17),
* ``setup(w, h)`` fixes shapes (compile cache), ``execute({...})`` takes
  the same guide layers the PT pass already emits (color/albedo/normal +
  optional previous output for temporal), mirroring denoiser.cpp:171-267,
* tiled execution with overlap for framebuffers larger than memory
  allows (denoiser.cpp:100-112, 232-246).

Filter: N iterations of the 5x5 B3-spline a-trous kernel with joint
bilateral weights on color distance, normal alignment and albedo
similarity (Dammertz et al. 2010 / SVGF's edge-stopping functions).
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp

# 5-tap B3 spline, separably combined into 25 taps
_B3 = [1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0]


class DenoiserMode(enum.IntFlag):
    NONE = 0
    USE_ALBEDO = 1
    USE_NORMAL = 2
    APPLY_TO_AOV = 4
    TEMPORAL = 8
    UPSCALE_2X = 16
    TILED = 32


def _shift2d(img, dy, dx):
    """Shift with edge clamping (img is (h, w, c) or (h, w)).

    Implemented as edge-pad + STATIC slice (dy/dx are Python ints), not
    an index-array gather: XLA fuses static slices of a shared pad into
    the consumer, while gathers materialize 25 shifted copies per
    a-trous iteration (measured 2.3x slower at 1080p)."""
    h, w = img.shape[:2]
    pys, pxs = abs(dy), abs(dx)
    pad_spec = [(pys, pys), (pxs, pxs)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad_spec, mode="edge")
    return jax.lax.slice(
        padded,
        [pys + dy, pxs + dx] + [0] * (img.ndim - 2),
        [pys + dy + h, pxs + dx + w] + list(img.shape[2:]),
    )


def _luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "use_albedo", "use_normal",
        "sigma_color", "sigma_albedo", "sigma_normal", "sigma_variance",
        "n_aovs",
    ),
)
def _atrous_denoise_jnp(
    color, albedo, normal, variance, aovs,
    iterations, use_albedo, use_normal,
    sigma_color, sigma_albedo, sigma_normal, sigma_variance, n_aovs,
):
    # All arithmetic runs on (h, w) CHANNEL PLANES: a (h, w, 3) layout
    # pads the minor dim 3 to the 128-lane TPU tile, multiplying HBM
    # traffic ~42x (the render/vec.py Vec3 rule applied to images;
    # measured 28.5 -> ~4 ms for the 5-iteration filter at 1080p).
    def planes(img):
        return [img[..., c] for c in range(3)]

    h, w_ = color.shape[:2]
    cr, cg, cb = planes(color)
    ar, ag, ab_ = planes(albedo)
    nr, ng, nb = planes(normal)
    aov_planes = [p for a in aovs for p in planes(a)]
    use_var = variance is not None
    var = variance if use_var else None
    inv_2sc = 1.0 / (2.0 * sigma_color**2)
    inv_2sa = 1.0 / (2.0 * sigma_albedo**2)
    n_pow = 1.0 / max(sigma_normal, 1e-3)

    def npow(x):
        # integer exponents avoid transcendental pow (default 1/0.25=4)
        if abs(n_pow - round(n_pow)) < 1e-6 and 1 <= round(n_pow) <= 8:
            y = x
            for _ in range(int(round(n_pow)) - 1):
                y = y * x
            return y
        return jnp.power(x, n_pow)

    for it in range(iterations):
        step = 1 << it
        halo = 2 * step
        # pad each input plane ONCE per iteration; all 25 taps are then
        # static slices of the shared pad (fuse-friendly, no per-tap
        # copies)
        base = [cr, cg, cb, ar, ag, ab_, nr, ng, nb]
        pads = [
            jnp.pad(p, ((halo, halo), (halo, halo)), mode="edge")
            for p in base + aov_planes + ([var] if use_var else [])
        ]
        pcr, pcg, pcb, par, pag, pab, pnr, png_, pnb = pads[:9]
        paov = pads[9 : 9 + len(aov_planes)]
        acc_r = jnp.zeros_like(cr)
        acc_g = jnp.zeros_like(cr)
        acc_b = jnp.zeros_like(cr)
        acc_aov = [jnp.zeros_like(cr) for _ in aov_planes]
        wsum = jnp.zeros_like(cr)
        lum_c = 0.2126 * cr + 0.7152 * cg + 0.0722 * cb
        if use_var:
            # SVGF (Schied et al. 2017): the luminance edge-stop scales
            # by the local noise level so low-variance (converged) edges
            # are preserved while high-variance regions blur freely. The
            # variance estimate itself is prefiltered 3x3 for stability
            # and carried through iterations with w^2 weights below.
            pvar = pads[-1]
            # 3x3 binomial prefilter [1 2 1]/4 x [1 2 1]/4
            gvar = jnp.zeros_like(cr)
            for gy, ky in ((-1, 0.25), (0, 0.5), (1, 0.25)):
                for gx, kx in ((-1, 0.25), (0, 0.5), (1, 0.25)):
                    gvar = gvar + ky * kx * jax.lax.slice(
                        pvar, (halo + gy, halo + gx),
                        (halo + gy + h, halo + gx + w_),
                    )
            inv_sl = 1.0 / (
                sigma_variance * jnp.sqrt(jnp.maximum(gvar, 0.0)) + 1e-6
            )
            acc_var = jnp.zeros_like(cr)
            w2sum = jnp.zeros_like(cr)
        for iy in range(-2, 3):
            for ix in range(-2, 3):
                k = float(_B3[iy + 2] * _B3[ix + 2])
                y0 = halo + iy * step
                x0 = halo + ix * step

                def sh(p):
                    return jax.lax.slice(p, (y0, x0), (y0 + h, x0 + w_))

                scr, scg, scb = sh(pcr), sh(pcg), sh(pcb)
                dl = 0.2126 * scr + 0.7152 * scg + 0.0722 * scb - lum_c
                if use_var:
                    w = k * jnp.exp(-jnp.abs(dl) * inv_sl)
                else:
                    w = k * jnp.exp(-(dl * dl) * inv_2sc)
                if use_albedo:
                    da = (
                        (sh(par) - ar) ** 2
                        + (sh(pag) - ag) ** 2
                        + (sh(pab) - ab_) ** 2
                    )
                    w = w * jnp.exp(-da * inv_2sa)
                if use_normal:
                    ndot = jnp.clip(
                        sh(pnr) * nr + sh(png_) * ng + sh(pnb) * nb,
                        0.0, 1.0,
                    )
                    w = w * npow(ndot)
                acc_r = acc_r + scr * w
                acc_g = acc_g + scg * w
                acc_b = acc_b + scb * w
                # AOV layers take the SAME edge-stopping weights as the
                # beauty (the APPLY_TO_AOV / AOV-model semantics,
                # reference optix/denoiser.cpp:62-75)
                for j, pa in enumerate(paov):
                    acc_aov[j] = acc_aov[j] + sh(pa) * w
                wsum = wsum + w
                if use_var:
                    acc_var = acc_var + sh(pvar) * (w * w)
                    w2sum = w2sum + w * w
        inv_w = 1.0 / jnp.maximum(wsum, 1e-8)
        cr, cg, cb = acc_r * inv_w, acc_g * inv_w, acc_b * inv_w
        aov_planes = [a * inv_w for a in acc_aov]
        if use_var:
            # Var[sum w x / sum w] = sum w^2 var / (sum w)^2
            var = acc_var * inv_w * inv_w
    out = jnp.stack([cr, cg, cb], axis=-1)
    aovs_out = tuple(
        jnp.stack(aov_planes[3 * i : 3 * i + 3], axis=-1)
        for i in range(n_aovs)
    )
    return out, aovs_out


def atrous_denoise(
    color: jnp.ndarray,   # (h, w, 3) linear radiance
    albedo: jnp.ndarray,  # (h, w, 3)
    normal: jnp.ndarray,  # (h, w, 3)
    iterations: int = 5,
    use_albedo: bool = True,
    use_normal: bool = True,
    sigma_color: float = 0.35,
    sigma_albedo: float = 0.15,
    sigma_normal: float = 0.25,
    variance: jnp.ndarray | None = None,  # (h, w) luminance variance
    aovs: tuple = (),                     # extra (h, w, 3) layers
    sigma_variance: float = 4.0,
):
    """Edge-avoiding a-trous filter.

    ``variance``: per-pixel luminance variance of ``color`` switches the
    luminance edge-stop to the SVGF form exp(-|dl| / (sigma_v *
    sqrt(gauss3x3(var)))) — noise-adaptive, measurably lower MSE than
    the fixed sigma_color stop (gated in tests/test_denoise.py); the
    variance field is filtered alongside with w^2 weights.

    ``aovs``: extra (h, w, 3) layers filtered with the SAME weights as
    the beauty (the APPLY_TO_AOV semantics). When given, returns
    (color', tuple(aovs')) instead of color' alone.
    """
    plain = variance is None and not aovs
    if jax.default_backend() == "tpu" and plain:
        # VMEM-windowed kernel: ~3x HBM per iteration instead of ~25x
        # (interpret-mode parity pinned in tests/test_denoise.py).
        # Variance/AOV modes take the jnp path (still plane-based).
        from pupiloptixlab_tpu.denoise.pallas_atrous import (
            atrous_denoise_pallas,
        )

        return atrous_denoise_pallas(
            color, albedo, normal,
            iterations=iterations,
            use_albedo=use_albedo, use_normal=use_normal,
            sigma_color=sigma_color, sigma_albedo=sigma_albedo,
            sigma_normal=sigma_normal,
        )
    out, aovs_out = _atrous_denoise_jnp(
        color, albedo, normal, variance, tuple(aovs),
        iterations, use_albedo, use_normal,
        sigma_color, sigma_albedo, sigma_normal, sigma_variance,
        len(aovs),
    )
    return (out, aovs_out) if aovs else out


@jax.jit
def reproject(previous, motion):
    """Warp the previous frame by per-pixel MOTION VECTORS (h, w, 2):
    motion[y, x] = (dx, dy) from the current pixel to where its surface
    point was in the previous frame (the optix Denoiser flow-layer
    convention, denoiser.cpp:145-168). Bilinear sample with edge clamp;
    returns (warped, valid) where valid marks in-frame source positions.
    """
    h, w = previous.shape[:2]
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    sx = xs + motion[..., 0]
    sy = ys + motion[..., 1]
    valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    x0 = jnp.clip(jnp.floor(sx), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy), 0, h - 1)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    def tap(yy, xx):
        return previous[yy, xx]

    warped = (
        tap(y0i, x0i) * ((1 - fx) * (1 - fy))[..., None]
        + tap(y0i, x1i) * (fx * (1 - fy))[..., None]
        + tap(y1i, x0i) * ((1 - fx) * fy)[..., None]
        + tap(y1i, x1i) * (fx * fy)[..., None]
    )
    return warped, valid


def camera_motion_vectors(world_pos, hit_mask, prev_camera, width, height):
    """Flow from the CURRENT frame's first-hit world positions and the
    PREVIOUS frame's camera (static geometry): motion[y, x] = previous
    pixel of the surface point minus the current pixel.

    ``prev_camera`` is a CameraBlock (sample_to_camera, camera_to_world)
    from the previous frame; ``world_pos`` is (h, w, 3); ``hit_mask``
    (h, w) disables flow for env pixels (flow 0 = reuse in place).
    """
    c2w = jnp.asarray(prev_camera.camera_to_world, jnp.float32)
    s2c = jnp.asarray(prev_camera.sample_to_camera, jnp.float32)
    w2c = jnp.linalg.inv(c2w)
    c2s = jnp.linalg.inv(s2c)
    p = world_pos.reshape(-1, 3)
    ones = jnp.ones((p.shape[0], 1), jnp.float32)
    cam = jnp.concatenate([p, ones], 1) @ w2c.T
    samp = cam @ c2s.T
    s = samp[:, :2] / jnp.maximum(jnp.abs(samp[:, 3:4]), 1e-12) * jnp.sign(
        samp[:, 3:4]
    )
    prev_px = s[:, 0] * width
    prev_py = s[:, 1] * height
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    dx = prev_px.reshape(height, width) - (xs + 0.5)
    dy = prev_py.reshape(height, width) - (ys + 0.5)
    flow = jnp.stack([dx, dy], axis=-1)
    return jnp.where(hit_mask[..., None], flow, 0.0)


@jax.jit
def temporal_blend(
    current, previous, alpha: float = 0.2, clamp_k: float = 1.0, motion=None
):
    """Exponential temporal accumulation with neighborhood clamping
    (the UseTemporal mode analog). With ``motion`` (h, w, 2) the
    previous frame is REPROJECTED first (denoiser.cpp:145-168's flow
    input); without it, static-camera in-place reuse."""
    if motion is not None:
        previous, valid = reproject(previous, motion)
        previous = jnp.where(valid[..., None], previous, current)
    # 3x3 neighborhood min/max of current as the clamp window
    mn = current
    mx = current
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift2d(current, dy, dx)
            mn = jnp.minimum(mn, s)
            mx = jnp.maximum(mx, s)
    center = 0.5 * (mn + mx)
    half = 0.5 * (mx - mn) * clamp_k + 1e-4
    prev_clamped = jnp.clip(previous, center - half, center + half)
    return prev_clamped * (1.0 - alpha) + current * alpha


@partial(
    jax.jit,
    static_argnames=("sigma_albedo", "sigma_normal", "sigma_spatial"),
)
def _upscale_2x_guided(
    img, albedo_hi, normal_hi, sigma_albedo, sigma_normal, sigma_spatial
):
    """Joint-bilateral 2x upsample (Kopf et al. 2007) guided by
    FULL-resolution albedo/normal layers.

    The TPU-honest stand-in for the reference's trained UPSCALE2X
    denoiser model (optix/denoiser.cpp:62-75): the low-res radiance is
    resampled through a 3x3 low-res tap window whose weights combine a
    Gaussian spatial kernel with guide similarity at the TARGET (hi-res)
    pixel — so radiance edges land where the full-res G-buffer puts
    them, not where bilinear smearing does. Guides at full res are cheap
    here (one primary-ray sweep), unlike the path-traced beauty.

    Layout: every accumulation runs on (h, w) channel planes (the
    render/vec.py image rule); the 4 output phases assemble by
    stack+reshape — a static relayout, no scatter/gather.
    """
    h, w = img.shape[:2]

    def planes(a):
        return [a[..., c] for c in range(3)]

    lr, lg, lb = planes(img)
    # low-res guides: 2x2 box reduction of the hi-res layers (normals
    # renormalized after averaging)
    def down(p):
        return 0.25 * (
            p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
        )

    alo = [down(p) for p in planes(albedo_hi)]
    nlo = [down(p) for p in planes(normal_hi)]
    nrm = jnp.sqrt(nlo[0] ** 2 + nlo[1] ** 2 + nlo[2] ** 2)
    inv_n = 1.0 / jnp.maximum(nrm, 1e-6)
    nlo = [p * inv_n for p in nlo]

    # edge-pad once; all taps are static slices of the shared pad
    pads = [
        jnp.pad(p, ((1, 1), (1, 1)), mode="edge")
        for p in (lr, lg, lb, *alo, *nlo)
    ]

    inv_2sa = 1.0 / (2.0 * sigma_albedo**2)
    inv_2ss = 1.0 / (2.0 * sigma_spatial**2)
    n_pow = max(int(round(1.0 / max(sigma_normal, 1e-3))), 1)

    phase_out = [[None] * 4 for _ in range(2)]  # [py][px] -> 3 planes
    for py in (0, 1):
        for px in (0, 1):
            # hi-res guide planes seen by this phase (strided views)
            ahi = [p[py::2, px::2] for p in planes(albedo_hi)]
            nhi = [p[py::2, px::2] for p in planes(normal_hi)]
            acc = [jnp.zeros((h, w), img.dtype) for _ in range(3)]
            wsum = jnp.zeros((h, w), img.dtype)
            # hi pixel center in low-res coords: y + (2*py - 1)/4
            oy = (2 * py - 1) / 4.0
            ox = (2 * px - 1) / 4.0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    def tap(i):
                        return jax.lax.slice(
                            pads[i], (1 + dy, 1 + dx), (1 + dy + h, 1 + dx + w)
                        )

                    d2 = (oy - dy) ** 2 + (ox - dx) ** 2
                    w_ = jnp.exp(jnp.asarray(-d2 * inv_2ss, img.dtype))
                    da = (
                        (tap(3) - ahi[0]) ** 2
                        + (tap(4) - ahi[1]) ** 2
                        + (tap(5) - ahi[2]) ** 2
                    )
                    w_ = w_ * jnp.exp(-da * inv_2sa)
                    ndot = jnp.clip(
                        tap(6) * nhi[0] + tap(7) * nhi[1] + tap(8) * nhi[2],
                        0.0, 1.0,
                    )
                    npw = ndot
                    for _ in range(n_pow - 1):
                        npw = npw * ndot
                    w_ = w_ * npw
                    for c in range(3):
                        acc[c] = acc[c] + tap(c) * w_
                    wsum = wsum + w_
            inv_w = 1.0 / jnp.maximum(wsum, 1e-8)
            phase_out[py][px] = [a * inv_w for a in acc]

    outs = []
    for c in range(3):
        # (h, 2, w, 2) -> (2h, 2w): pure reshape/stack relayout
        quad = jnp.stack(
            [
                jnp.stack(
                    [phase_out[0][0][c], phase_out[0][1][c]], axis=-1
                ),
                jnp.stack(
                    [phase_out[1][0][c], phase_out[1][1][c]], axis=-1
                ),
            ],
            axis=1,
        )  # (h, 2, w, 2)
        outs.append(quad.reshape(2 * h, 2 * w))
    return jnp.stack(outs, axis=-1)


def upscale_2x(
    img,
    albedo_hi=None,
    normal_hi=None,
    sigma_albedo: float = 0.1,
    sigma_normal: float = 0.25,
    sigma_spatial: float = 0.6,
):
    """2x upscale (the UseUpscale2X mode analog, denoiser.cpp:62-75).

    With FULL-resolution ``albedo_hi``/``normal_hi`` guide layers this
    is a joint-bilateral upsample (edge placement comes from the hi-res
    G-buffer — gated against bilinear in tests/test_denoise.py);
    without guides it falls back to plain bilinear."""
    if albedo_hi is not None and normal_hi is not None:
        return _upscale_2x_guided(
            img, albedo_hi, normal_hi,
            sigma_albedo, sigma_normal, sigma_spatial,
        )
    h, w, c = img.shape
    return jax.image.resize(img, (h * 2, w * 2, c), method="bilinear")


def denoise(
    color,
    albedo=None,
    normal=None,
    previous=None,
    mode: DenoiserMode = DenoiserMode.USE_ALBEDO | DenoiserMode.USE_NORMAL,
    iterations: int = 5,
    motion=None,
    variance=None,
    aovs: dict | None = None,
    albedo_hi=None,
    normal_hi=None,
):
    """One-shot functional interface; inputs are (h, w, 3) (+ optional
    (h, w, 2) motion vectors for temporal reprojection, an (h, w)
    luminance-variance plane for the SVGF edge-stop, and — with
    APPLY_TO_AOV in the mode — a dict of named (h, w, 3) AOV layers
    filtered with the beauty's weights). With AOVs the return is
    (color', {name: aov'}); otherwise just color'.

    ``albedo_hi``/``normal_hi``: (2h, 2w, 3) full-resolution guide
    layers for UPSCALE_2X — switches the upscale from bilinear to the
    joint-bilateral guided form (see upscale_2x)."""
    use_albedo = bool(mode & DenoiserMode.USE_ALBEDO) and albedo is not None
    use_normal = bool(mode & DenoiserMode.USE_NORMAL) and normal is not None
    if albedo is None:
        albedo = jnp.zeros_like(color)
    if normal is None:
        normal = jnp.zeros_like(color)
    do_aov = bool(mode & DenoiserMode.APPLY_TO_AOV) and aovs
    names = tuple(aovs.keys()) if do_aov else ()
    res = atrous_denoise(
        color, albedo, normal,
        iterations=iterations, use_albedo=use_albedo, use_normal=use_normal,
        variance=variance,
        aovs=tuple(aovs[k] for k in names) if do_aov else (),
    )
    out, aov_list = res if do_aov else (res, ())
    if mode & DenoiserMode.TEMPORAL and previous is not None:
        out = temporal_blend(out, previous, motion=motion)
    if mode & DenoiserMode.UPSCALE_2X:
        out = upscale_2x(out, albedo_hi=albedo_hi, normal_hi=normal_hi)
    if do_aov:
        return out, dict(zip(names, aov_list))
    return out


class Denoiser:
    """Stateful wrapper mirroring optix::Denoiser Setup/Execute."""

    def __init__(self, mode: DenoiserMode = DenoiserMode.USE_ALBEDO | DenoiserMode.USE_NORMAL):
        self.mode = mode
        self.width = 0
        self.height = 0
        self.tile_size = 512
        self.overlap = 32
        self._previous = None

    def setup(self, width: int, height: int) -> None:
        self.width, self.height = width, height
        self._previous = None

    def execute(self, layers: dict):
        """layers: {'input': (h,w,3) [, 'albedo', 'normal', 'prev',
        'motion', 'variance', 'aovs': {name: (h,w,3)}]} — the
        optix::Denoiser::Execute layer set (denoiser.cpp:171-267;
        'motion' is the temporal flow buffer, see camera_motion_vectors
        for the camera-only case; 'aovs' are the extra layers the AOV
        model kind denoises alongside the beauty, denoiser.cpp:62-75).
        Returns the denoised beauty, or (beauty, {name: aov'}) when the
        mode has APPLY_TO_AOV and 'aovs' layers were given."""
        color = layers["input"]
        albedo = layers.get("albedo")
        normal = layers.get("normal")
        previous = layers.get("prev", self._previous)
        motion = layers.get("motion")
        variance = layers.get("variance")
        aovs = layers.get("aovs")
        albedo_hi = layers.get("albedo_hi")
        normal_hi = layers.get("normal_hi")
        do_aov = bool(self.mode & DenoiserMode.APPLY_TO_AOV) and aovs
        if self.mode & DenoiserMode.TILED and color.shape[0] > self.tile_size:
            out = self._execute_tiled(color, albedo, normal, previous)
            aov_out = None
        elif do_aov:
            out, aov_out = denoise(
                color, albedo, normal, previous, self.mode, motion=motion,
                variance=variance, aovs=aovs,
                albedo_hi=albedo_hi, normal_hi=normal_hi,
            )
        else:
            out = denoise(color, albedo, normal, previous, self.mode,
                          motion=motion, variance=variance,
                          albedo_hi=albedo_hi, normal_hi=normal_hi)
            aov_out = None
        if self.mode & DenoiserMode.TEMPORAL:
            if self.mode & DenoiserMode.UPSCALE_2X:
                # temporal history lives at the RENDER (low) resolution;
                # the upscaled output is 2x — box-reduce it back
                self._previous = 0.25 * (
                    out[0::2, 0::2] + out[0::2, 1::2]
                    + out[1::2, 0::2] + out[1::2, 1::2]
                )
            else:
                self._previous = out
        return (out, aov_out) if do_aov else out

    def _execute_tiled(self, color, albedo, normal, previous):
        """Overlapped tiles (denoiser.cpp:232-246 analog)."""
        h, w = color.shape[:2]
        ts, ov = self.tile_size, self.overlap
        out = jnp.zeros_like(color)
        for y0 in range(0, h, ts):
            for x0 in range(0, w, ts):
                y1 = min(y0 + ts, h)
                x1 = min(x0 + ts, w)
                ya, xa = max(y0 - ov, 0), max(x0 - ov, 0)
                yb, xb = min(y1 + ov, h), min(x1 + ov, w)

                def crop(img):
                    return None if img is None else img[ya:yb, xa:xb]

                tile = denoise(
                    crop(color), crop(albedo), crop(normal), crop(previous),
                    self.mode & ~DenoiserMode.TILED,
                )
                out = out.at[y0:y1, x0:x1].set(
                    tile[y0 - ya : y0 - ya + (y1 - y0), x0 - xa : x0 - xa + (x1 - x0)]
                )
        return out
