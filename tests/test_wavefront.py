"""Wavefront engine: agreement with the megakernel integrator + queues."""

import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render.integrator import render
from pupiloptixlab_tpu.scene import load_scene
from pupiloptixlab_tpu.wavefront import compact_queue, render_wavefront, sort_by_key


@pytest.fixture(scope="module")
def cornell_small(reference_scene_dir):
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w = scene.sensor.film.h = 24
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    return data, config, camera


def test_wavefront_matches_megakernel_mean(cornell_small):
    """Same estimator -> means must agree statistically (different RNG
    pairing, so compare expectations, not pixels)."""
    data, config, camera = cornell_small
    spp = 48
    mega = np.asarray(render(data, camera, config, spp=spp))
    wave = np.asarray(
        render_wavefront(data, camera, jnp.uint32(0), config, spp=spp)["film"]
    ).reshape(config.height, config.width, 3)
    assert np.isfinite(wave).all()
    # global mean radiance agreement within MC noise
    assert wave.mean() == pytest.approx(mega.mean(), rel=0.05)
    # per-pixel correlation is high (same image up to noise)
    a = mega.reshape(-1)
    b = wave.reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95


def test_wavefront_open_scene(reference_scene_dir):
    """mis.xml: half the rays escape; wavefront must stay finite/sane."""
    scene = load_scene(reference_scene_dir / "mis.xml")
    scene.sensor.film.w, scene.sensor.film.h = 32, 18
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    out = render_wavefront(data, camera, jnp.uint32(1), config, spp=8)
    img = np.asarray(out["film"])
    assert np.isfinite(img).all()
    assert img.max() > 0.1


def test_compact_queue_packs_alive_first():
    alive = jnp.asarray([False, True, False, True, True, False])
    q = {"a": jnp.arange(6), "b": jnp.arange(6) * 10.0}
    packed, count = compact_queue(q, alive)
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(packed["a"][:3]), [1, 3, 4])
    np.testing.assert_array_equal(np.asarray(packed["b"][:3]), [10.0, 30.0, 40.0])


def test_sort_by_key_coherence():
    key = jnp.asarray([3, 1, 2, 1, 3, 0])
    q = {"v": jnp.arange(6)}
    sorted_q, perm = sort_by_key(q, key)
    np.testing.assert_array_equal(np.asarray(key[perm]), [0, 1, 1, 2, 3, 3])
