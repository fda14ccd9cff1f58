"""Multi-chip pixel sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.parallel import make_mesh, render_frame_sharded, shard_scene
from pupiloptixlab_tpu.render.integrator import render_frame
from pupiloptixlab_tpu.scene import load_scene


@pytest.fixture(scope="module")
def tiny_cornell(reference_scene_dir):
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w, scene.sensor.film.h = 16, 16
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    return data, config, camera


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(tiny_cornell):
    data, config, camera = tiny_cornell
    n = config.width * config.height
    accum0 = jnp.zeros((n, 3), jnp.float32)

    ref_accum, ref_bufs = render_frame(
        data, camera, jnp.uint32(7), jnp.int32(0), accum0, config
    )

    mesh = make_mesh(8)
    sharded_scene = shard_scene(data, mesh)
    accum_sharded = jax.device_put(
        jnp.zeros((n, 3), jnp.float32), NamedSharding(mesh, P("pixels"))
    )
    out_accum, out_bufs = render_frame_sharded(
        mesh, sharded_scene, camera, seed=7, sample_cnt=0,
        accum=accum_sharded, config=config,
    )
    np.testing.assert_allclose(
        np.asarray(ref_accum), np.asarray(out_accum), rtol=1e-4, atol=1e-5
    )
    # the output really is sharded over the mesh
    assert len(out_accum.sharding.device_set) == 8
