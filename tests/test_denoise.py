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


def test_denoiser_temporal_state():
    noisy, clean, albedo, normal = _noisy_scene(seed=4)
    d = Denoiser(DenoiserMode.USE_ALBEDO | DenoiserMode.TEMPORAL)
    d.setup(48, 48)
    out1 = d.execute({"input": noisy, "albedo": albedo, "normal": normal})
    out2 = d.execute({"input": noisy, "albedo": albedo, "normal": normal})
    assert d._previous is not None
    assert out2.shape == noisy.shape
