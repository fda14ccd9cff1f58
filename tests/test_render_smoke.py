"""End-to-end smoke: load cornell box, render small, check sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render import render
from pupiloptixlab_tpu.scene import load_scene


@pytest.fixture(scope="module")
def cornell(reference_scene_dir):
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    # shrink for test speed
    scene.sensor.film.w = 32
    scene.sensor.film.h = 32
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    return scene, data, config, camera


def test_flatten_counts(cornell):
    scene, data, config, camera = cornell
    # 5 rects (2 tris) + 2 cubes (12 tris) + 1 light rect (2 tris) = 36 tris
    assert config.tri_count == 36
    assert config.sphere_count == 0
    assert config.emitter_count == 2  # light rectangle -> 2 triangle emitters
    assert not config.has_env
    # selection probabilities sum to 1 (no env)
    np.testing.assert_allclose(
        float(jnp.sum(data.emitters.select_prob[:2])), 1.0, rtol=1e-5
    )


def test_render_cornell_sanity(cornell):
    scene, data, config, camera = cornell
    img = np.asarray(render(data, camera, config, spp=4))
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05  # scene is lit
    # light (y~2) should appear in the upper part of the film -> rows with
    # film y near 1; buffer row r is film sy=(r+.5)/h so high rows = top
    top_mean = img[24:, :, :].mean()
    bottom_mean = img[:8, :, :].mean()
    assert top_mean != bottom_mean  # non-degenerate vertical structure


def test_progressive_accumulation_reduces_variance(cornell):
    scene, data, config, camera = cornell
    img1 = np.asarray(render(data, camera, config, spp=1))
    img8 = np.asarray(render(data, camera, config, spp=8))
    # mean brightness roughly stable; accumulate more -> closer to itself
    assert abs(img1.mean() - img8.mean()) / max(img8.mean(), 1e-9) < 0.5
