import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.denoise import Denoiser, DenoiserMode, denoise
from pupiloptixlab_tpu.denoise.atrous import temporal_blend, upscale_2x


def _noisy_scene(h=48, w=48, seed=0, noise=0.3):
    rng = np.random.RandomState(seed)
    # two flat regions separated by an edge, plus noise
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = [0.8, 0.2, 0.2]
    clean[:, w // 2 :] = [0.2, 0.8, 0.2]
    albedo = clean.copy()
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    noisy = clean + rng.randn(h, w, 3).astype(np.float32) * noise
    return (
        jnp.asarray(noisy),
        jnp.asarray(clean),
        jnp.asarray(albedo),
        jnp.asarray(normal),
    )


@pytest.mark.heavy
def test_denoise_reduces_mse_preserves_edges():
    noisy, clean, albedo, normal = _noisy_scene()
    out = denoise(noisy, albedo, normal)
    mse_before = float(jnp.mean((noisy - clean) ** 2))
    mse_after = float(jnp.mean((out - clean) ** 2))
    assert mse_after < mse_before * 0.15
    # edge preserved: region means stay distinct
    left = np.asarray(out[:, :20]).mean(axis=(0, 1))
    right = np.asarray(out[:, 28:]).mean(axis=(0, 1))
    assert left[0] > 0.5 and right[1] > 0.5


@pytest.mark.heavy
def test_denoise_without_guides_still_smooths():
    noisy, clean, _, _ = _noisy_scene(seed=1)
    out = denoise(noisy, mode=DenoiserMode.NONE)
    assert float(jnp.mean((out - clean) ** 2)) < float(
        jnp.mean((noisy - clean) ** 2)
    )


def test_temporal_blend_converges():
    noisy, clean, _, _ = _noisy_scene(seed=2, noise=0.15)
    prev = clean  # pretend history converged
    out = temporal_blend(noisy, prev, alpha=0.2)
    assert float(jnp.mean((out - clean) ** 2)) < float(
        jnp.mean((noisy - clean) ** 2)
    )


def test_upscale_2x_shape():
    noisy, *_ = _noisy_scene()
    up = upscale_2x(noisy)
    assert up.shape == (96, 96, 3)


def _upscale_scene(h=64, w=64, seed=3):
    """Hi-res scene whose radiance edge is NOT aligned to the low-res
    grid (a diagonal material boundary), plus the full-res G-buffer.
    Returns (clean_hi, albedo_hi, normal_hi, low) with low = 2x2
    box-downsampled clean (the half-res render a UPSCALE_2X pipeline
    would produce)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    left = (xs + 0.37 * ys) < (0.71 * w)
    clean = np.where(
        left[..., None], [0.9, 0.25, 0.1], [0.05, 0.4, 0.85]
    ).astype(np.float32)
    albedo = clean.copy()
    normal = np.where(
        left[..., None], [0.0, 0.0, 1.0],
        [0.0, 0.70710678, 0.70710678],
    ).astype(np.float32)
    low = 0.25 * (
        clean[0::2, 0::2] + clean[0::2, 1::2]
        + clean[1::2, 0::2] + clean[1::2, 1::2]
    )
    return (
        jnp.asarray(clean), jnp.asarray(albedo),
        jnp.asarray(normal), jnp.asarray(low),
    )


def test_guided_upscale_beats_bilinear():
    # the UPSCALE_2X quality gate (reference: a TRAINED 2x model,
    # optix/denoiser.cpp:62-75): with full-res albedo/normal guides the
    # joint-bilateral upsample must place the edge where the G-buffer
    # has it, beating plain bilinear MSE by a wide margin
    clean, albedo, normal, low = _upscale_scene()
    up_bil = upscale_2x(low)
    up_gui = upscale_2x(low, albedo_hi=albedo, normal_hi=normal)
    assert up_gui.shape == clean.shape
    mse_bil = float(jnp.mean((up_bil - clean) ** 2))
    mse_gui = float(jnp.mean((up_gui - clean) ** 2))
    assert mse_gui < 0.5 * mse_bil, (mse_gui, mse_bil)
    # flat regions stay exact (guides constant there -> plain resample
    # of a constant): max error away from the boundary is tiny
    err = np.abs(np.asarray(up_gui - clean)).max(axis=-1)
    ys, xs = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    dist = np.abs((xs + 0.37 * ys) - 0.71 * 64)
    assert err[dist > 6].max() < 1e-3


def test_denoiser_upscale_2x_guided_layers():
    clean, albedo, normal, low = _upscale_scene()

    def down(img):
        return 0.25 * (
            img[0::2, 0::2] + img[0::2, 1::2]
            + img[1::2, 0::2] + img[1::2, 1::2]
        )

    layers = {"input": low, "albedo": down(albedo), "normal": down(normal)}
    den = Denoiser(
        DenoiserMode.UPSCALE_2X
        | DenoiserMode.USE_ALBEDO
        | DenoiserMode.USE_NORMAL
    )
    den.setup(32, 32)
    out = den.execute(dict(layers, albedo_hi=albedo, normal_hi=normal))
    assert out.shape == clean.shape
    mse_bil = float(jnp.mean((den.execute(layers) - clean) ** 2))
    assert float(jnp.mean((out - clean) ** 2)) < 0.5 * mse_bil


@pytest.mark.heavy
def test_denoiser_class_modes_and_tiling():
    noisy, clean, albedo, normal = _noisy_scene(h=80, w=64, seed=3)
    d = Denoiser(
        DenoiserMode.USE_ALBEDO | DenoiserMode.USE_NORMAL | DenoiserMode.TILED
    )
    d.setup(64, 80)
    d.tile_size = 40
    d.overlap = 8
    out = d.execute({"input": noisy, "albedo": albedo, "normal": normal})
    assert out.shape == noisy.shape
    assert float(jnp.mean((out - clean) ** 2)) < float(
        jnp.mean((noisy - clean) ** 2)
    )


@pytest.mark.heavy
def test_denoiser_temporal_state():
    noisy, clean, albedo, normal = _noisy_scene(seed=4)
    d = Denoiser(DenoiserMode.USE_ALBEDO | DenoiserMode.TEMPORAL)
    d.setup(48, 48)
    out1 = d.execute({"input": noisy, "albedo": albedo, "normal": normal})
    out2 = d.execute({"input": noisy, "albedo": albedo, "normal": normal})
    assert d._previous is not None
    assert out2.shape == noisy.shape


def test_reproject_recovers_shifted_frame():
    """Constant flow must undo a pure image translation (the motion
    buffer convention: current pixel -> previous position)."""
    import jax.numpy as jnp
    from pupiloptixlab_tpu.denoise.atrous import reproject

    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(24, 32, 3).astype(np.float32))
    # previous frame = current shifted right by 3, down by 2
    prev = jnp.zeros_like(img)
    prev = prev.at[2:, 3:].set(img[:-2, :-3])
    motion = jnp.broadcast_to(jnp.asarray([3.0, 2.0], jnp.float32), (24, 32, 2))
    warped, valid = reproject(prev, motion)
    inner = np.asarray(valid)[: 24 - 2, : 32 - 3]
    assert inner.all()
    np.testing.assert_allclose(
        np.asarray(warped)[: 24 - 2, : 32 - 3],
        np.asarray(img)[: 24 - 2, : 32 - 3],
        atol=1e-5,
    )


def test_camera_motion_vectors_static_camera_zero():
    """Same camera both frames -> flow ~ 0 at every hit pixel."""
    import jax.numpy as jnp
    from pupiloptixlab_tpu.denoise.atrous import camera_motion_vectors
    from pupiloptixlab_tpu.flatten import camera_block
    from pupiloptixlab_tpu.utils.camera import Camera, CameraDesc
    from pupiloptixlab_tpu.utils.math import Transform

    cam = Camera(CameraDesc(fov_y=60.0, aspect_ratio=1.0, to_world=Transform()))
    block = camera_block(cam)
    w = h = 16
    # world points: push each pixel's center ray out to depth 3
    import numpy as _np

    s2c = _np.asarray(block.sample_to_camera)
    c2w = _np.asarray(block.camera_to_world)
    px, py = _np.meshgrid(_np.arange(w), _np.arange(h))
    ndc = _np.stack(
        [(px.ravel() + 0.5) / w, (py.ravel() + 0.5) / h,
         _np.zeros(w * h), _np.ones(w * h)], 1)
    pc = ndc @ s2c.T
    pc = pc[:, :3] / pc[:, 3:4]
    d = pc / _np.linalg.norm(pc, axis=1, keepdims=True)
    dw = (_np.concatenate([d, _np.zeros((w * h, 1))], 1) @ c2w.T)[:, :3]
    pos = (c2w[:3, 3] + dw * 3.0).reshape(h, w, 3).astype(_np.float32)

    flow = camera_motion_vectors(
        jnp.asarray(pos), jnp.ones((h, w), bool), block, w, h
    )
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=2e-2)


def test_temporal_blend_with_motion_beats_unwarped():
    """Under camera translation the reprojected history must track the
    moved content better than in-place reuse."""
    import jax.numpy as jnp
    from pupiloptixlab_tpu.denoise.atrous import temporal_blend

    r = np.random.RandomState(1)
    base = r.rand(24, 32, 3).astype(np.float32)
    prev = np.zeros_like(base)
    prev[:, 4:] = base[:, :-4]  # scene slid 4 px right last frame
    cur = base
    motion = jnp.broadcast_to(jnp.asarray([4.0, 0.0], jnp.float32), (24, 32, 2))
    with_m = np.asarray(
        temporal_blend(jnp.asarray(cur), jnp.asarray(prev), motion=motion)
    )
    without = np.asarray(temporal_blend(jnp.asarray(cur), jnp.asarray(prev)))
    err_m = np.mean((with_m[:, : -4] - cur[:, : -4]) ** 2)
    err_0 = np.mean((without[:, : -4] - cur[:, : -4]) ** 2)
    assert err_m < err_0


def _noisy_samples(h=48, w=48, seed=5, k=4):
    """k noisy samples of a scene the GUIDES cannot help with: flat
    albedo/normal, an ILLUMINATION step (shadow edge) at w/2, and
    spatially varying noise (top half converged, bottom half noisy) —
    the case the SVGF variance-adaptive luminance stop targets.
    Returns (mean, variance-of-the-mean (luminance), clean, albedo,
    normal)."""
    rng = np.random.RandomState(seed)
    clean = np.full((h, w, 3), 0.15, np.float32)
    clean[:, : w // 2] = 1.0
    albedo = np.full((h, w, 3), 0.5, np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    sigma = np.full((h, w, 1), 0.02, np.float32)
    sigma[h // 2 :] = 0.5
    samples = clean[None] + rng.randn(k, h, w, 3).astype(np.float32) * sigma
    mean = samples.mean(0)
    lum = samples @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    var = lum.var(0, ddof=1) / k  # variance of the mean estimate
    return (
        jnp.asarray(mean), jnp.asarray(var), jnp.asarray(clean),
        jnp.asarray(albedo), jnp.asarray(normal),
    )


@pytest.mark.heavy
def test_variance_guided_beats_fixed_sigma():
    """The SVGF-style variance edge-stop must beat the fixed sigma_color
    stop at EQUAL iteration count on the shadow-edge + varying-noise
    scene (the VERDICT-r3 quality gate): the fixed stop undersmooths
    the noisy half to protect the edge; the adaptive stop does both
    (measured ~18% lower MSE at the default sigma_variance)."""
    from pupiloptixlab_tpu.denoise.atrous import atrous_denoise

    noisy, var, clean, albedo, normal = _noisy_samples()
    plain = atrous_denoise(noisy, albedo, normal, iterations=3)
    guided = atrous_denoise(noisy, albedo, normal, iterations=3,
                            variance=var)
    mse_p = float(jnp.mean((plain - clean) ** 2))
    mse_g = float(jnp.mean((guided - clean) ** 2))
    assert mse_g < mse_p, (mse_g, mse_p)
    # and it still denoises in absolute terms
    assert mse_g < float(jnp.mean((noisy - clean) ** 2)) * 0.5


@pytest.mark.heavy
def test_apply_to_aov_same_weights():
    """APPLY_TO_AOV filters extra layers with the beauty's weights: an
    AOV equal to the color must come out exactly like the color; a
    noisy AOV must be smoothed; the beauty result is unchanged by the
    presence of AOVs."""
    from pupiloptixlab_tpu.denoise.atrous import atrous_denoise

    noisy, clean, albedo, normal = _noisy_scene(seed=6)
    r = np.random.RandomState(8)
    aov_noise = jnp.asarray(
        0.5 + 0.2 * r.randn(48, 48, 3).astype(np.float32)
    )
    base = atrous_denoise(noisy, albedo, normal, iterations=2)
    out, (a_same, a_noise) = atrous_denoise(
        noisy, albedo, normal, iterations=2, aovs=(noisy, aov_noise)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_same), np.asarray(base),
                               atol=1e-6)
    assert float(jnp.var(a_noise)) < float(jnp.var(aov_noise)) * 0.5


@pytest.mark.heavy
def test_denoiser_class_apply_to_aov():
    noisy, clean, albedo, normal = _noisy_scene(seed=9)
    d = Denoiser(
        DenoiserMode.USE_ALBEDO | DenoiserMode.USE_NORMAL
        | DenoiserMode.APPLY_TO_AOV
    )
    d.setup(48, 48)
    out, aovs = d.execute({
        "input": noisy, "albedo": albedo, "normal": normal,
        "aovs": {"diffuse": noisy},
    })
    assert out.shape == noisy.shape
    assert set(aovs) == {"diffuse"}
    assert aovs["diffuse"].shape == noisy.shape


@pytest.mark.heavy
def test_pallas_atrous_matches_jnp():
    """The VMEM-windowed Pallas a-trous (interpret mode) is bit-close
    to the jnp formulation, across guide modes, iteration counts and a
    non-aligned film size."""
    import jax.numpy as jnp

    from pupiloptixlab_tpu.denoise.atrous import atrous_denoise
    from pupiloptixlab_tpu.denoise.pallas_atrous import atrous_denoise_pallas

    r = np.random.RandomState(7)
    # 48x48 (not lane/stripe aligned) reuses the jnp compile cache from
    # _noisy_scene-shaped tests above — the 5-iteration jnp reference
    # costs ~1 min to compile per (shape, flags) variant
    h, w = 48, 48
    color = jnp.asarray(r.rand(h, w, 3).astype(np.float32))
    albedo = jnp.asarray(r.rand(h, w, 3).astype(np.float32))
    nr = r.randn(h, w, 3).astype(np.float32)
    nr /= np.maximum(np.linalg.norm(nr, axis=-1, keepdims=True), 1e-9)
    normal = jnp.asarray(nr)

    for kwargs in (
        {},
        {"iterations": 2, "use_albedo": False, "use_normal": False},
    ):
        ref = np.asarray(atrous_denoise(color, albedo, normal, **kwargs))
        got = np.asarray(
            atrous_denoise_pallas(
                color, albedo, normal, interpret=True, **kwargs
            )
        )
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)
