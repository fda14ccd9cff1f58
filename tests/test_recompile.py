"""Interactivity guarantees: edits must not retrace/recompile.

The reference avoids per-frame pipeline rebuilds by mutating launch
params (pt_pass.cpp:40-49). Our analog: camera blocks and re-flattened
scenes must keep identical pytree structure + shapes + static config so
the render_frame jit cache stays warm.
"""

import jax
import numpy as np
import pytest

from pupiloptixlab_tpu.scene import load_scene
from pupiloptixlab_tpu.utils.math import Transform
from pupiloptixlab_tpu.world import World


@pytest.fixture()
def world(reference_scene_dir):
    w = World()
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w = scene.sensor.film.h = 16
    w.set_scene(scene)
    return w


def test_camera_edit_keeps_structure(world):
    data0, config0 = world.get_scene_data()
    cam0 = world.get_camera_block()
    world.camera.rotate(5.0, 2.0)
    world.camera.move(np.array([0, 0, -0.1], np.float32))
    world._camera_dirty = True
    cam1 = world.get_camera_block()
    assert jax.tree_util.tree_structure(cam0) == jax.tree_util.tree_structure(cam1)
    assert cam0.camera_to_world.shape == cam1.camera_to_world.shape
    # scene untouched -> same cached arrays (no re-flatten)
    data1, config1 = world.get_scene_data()
    assert data0 is data1 and config0 == config1


def test_transform_edit_keeps_shapes_and_config(world):
    data0, config0 = world.get_scene_data()
    ro = world.get_render_object("ShortBox")
    ro.apply_transform(Transform().translate(0.1, 0.0, 0.0))
    data1, config1 = world.get_scene_data()
    # re-flattened (new arrays) but identical static signature
    assert data0 is not data1
    assert config0 == config1  # hashable static config unchanged -> cache hit
    s0 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), data0)
    s1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), data1)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda x, y: x == y, s0, s1)
    )


def test_visibility_toggle_keeps_shapes_and_config(world):
    """A visibility edit must behave like a transform edit: new array
    values, identical shapes + static config (no retrace). Hidden
    geometry must stop receiving hits and stop emitting."""
    data0, config0 = world.get_scene_data()
    ro = world.get_render_object("ShortBox")
    ro.set_visible(False)
    data1, config1 = world.get_scene_data()
    assert data0 is not data1
    assert config0 == config1
    s0 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), data0)
    s1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), data1)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda x, y: x == y, s0, s1)
    )

    # the hidden instance's triangles are degenerate (never hit) and the
    # remaining scene still renders
    from pupiloptixlab_tpu.flatten import camera_block
    from pupiloptixlab_tpu.render.integrator import render_frame
    import jax.numpy as jnp

    n = config0.width * config0.height
    cam = camera_block(world.camera)
    accum0 = jnp.zeros((n, 3), jnp.float32)
    acc_vis, _ = render_frame(data0, cam, jnp.uint32(3), jnp.int32(0), accum0, config0)
    accum1 = jnp.zeros((n, 3), jnp.float32)
    acc_hid, _ = render_frame(data1, cam, jnp.uint32(3), jnp.int32(0), accum1, config1)
    a, b = np.asarray(acc_vis), np.asarray(acc_hid)
    assert np.isfinite(b).all()
    assert not np.allclose(a, b), "hiding the box should change the image"

    ro.set_visible(True)
    data2, config2 = world.get_scene_data()
    assert config2 == config0
    accum2 = jnp.zeros((n, 3), jnp.float32)
    acc_back, _ = render_frame(data2, cam, jnp.uint32(3), jnp.int32(0), accum2, config2)
    np.testing.assert_allclose(np.asarray(acc_back), a, rtol=1e-5, atol=1e-6)


def test_no_retrace_across_edits(world):
    import jax.numpy as jnp

    from pupiloptixlab_tpu.render.integrator import render_frame

    data, config = world.get_scene_data()
    n = config.width * config.height
    traces = {"count": 0}

    # count retraces via a fresh wrapper (render_frame's global cache may
    # already hold entries from other tests)
    from functools import partial

    inner = render_frame.__wrapped__

    def counting(*args, **kw):
        traces["count"] += 1
        return inner(*args, **kw)

    fn = jax.jit(
        partial(counting, config=config), donate_argnames=("accum",)
    )
    accum = jnp.zeros((n, 3), jnp.float32)
    accum, _ = fn(data, world.get_camera_block(), jnp.uint32(0), jnp.int32(0), accum)

    # camera edit
    world.camera.rotate(3.0, 0.0)
    world._camera_dirty = True
    accum, _ = fn(data, world.get_camera_block(), jnp.uint32(1), jnp.int32(1), accum)

    # instance edit -> re-flatten
    world.get_render_object("TallBox").apply_transform(
        Transform().translate(0.0, 0.0, 0.05)
    )
    data, _ = world.get_scene_data()
    accum, _ = fn(data, world.get_camera_block(), jnp.uint32(2), jnp.int32(2), accum)

    assert traces["count"] == 1, f"retraced {traces['count']} times"
