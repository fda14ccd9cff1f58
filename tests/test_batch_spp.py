"""Batched-spp dispatch + sample-parallel sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render.integrator import render_frame, render_frame_batch
from pupiloptixlab_tpu.scene import load_scene


@pytest.fixture(scope="module")
def tiny(reference_scene_dir):
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w = scene.sensor.film.h = 16
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    return data, config, camera


def test_batch_matches_sequential(tiny):
    data, config, camera = tiny
    n = config.width * config.height
    spp = 4

    accum_seq = jnp.zeros((n, 3), jnp.float32)
    for s in range(spp):
        accum_seq, _ = render_frame(
            data, camera, jnp.uint32(s), jnp.int32(s), accum_seq, config
        )

    accum_batch, bufs = render_frame_batch(
        data, camera, jnp.uint32(0), jnp.int32(0),
        jnp.zeros((n, 3), jnp.float32), config, spp,
    )
    np.testing.assert_allclose(
        np.asarray(accum_seq), np.asarray(accum_batch), rtol=1e-5, atol=1e-6
    )
    assert np.isfinite(np.asarray(bufs["albedo"])).all()


@pytest.mark.heavy
def test_sample_sharded_mean(tiny):
    from pupiloptixlab_tpu.parallel import make_mesh, shard_scene
    from pupiloptixlab_tpu.parallel.sharding import render_samples_sharded
    from pupiloptixlab_tpu.render.integrator import render_sample

    data, config, camera = tiny
    mesh = make_mesh(8, axis="samples")
    out = render_samples_sharded(mesh, data, camera, seed0=3, config=config)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # equals the mean of the 8 per-seed samples computed locally
    ref = np.mean(
        [
            np.asarray(render_sample(data, camera, jnp.uint32(3 + i), config)["radiance"])
            for i in range(8)
        ],
        axis=0,
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
