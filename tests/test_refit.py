"""Device refit (flatten/refit.py) vs full host re-flatten.

The refit is the IAS::Update analog (world/ias_manager.cpp:116-151):
transform + visibility edits regenerate world-space rows, BVH/chunk
boxes and emitter CDFs on device with identical array shapes. For small
scenes (no BVH reorder on rebuild... the BVH path keeps its topology,
which a rebuild would not) we validate against the host flatten at the
RENDER level, and field-by-field where orders coincide.
"""

import dataclasses

import jax
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten import camera_block, flatten_scene
from pupiloptixlab_tpu.render.integrator import render
from pupiloptixlab_tpu.scene import load_scene
from pupiloptixlab_tpu.utils.math import Transform
from pupiloptixlab_tpu.world import World


@pytest.fixture()
def cornell_world(reference_scene_dir):
    w = World()
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w = scene.sensor.film.h = 24
    w.set_scene(scene)
    return w


def _tree_allclose(a, b, atol=1e-5):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=1e-4
        )


def test_identity_refit_matches_flatten(cornell_world):
    w = cornell_world
    data0, config0 = w.get_scene_data()
    assert w._refit is not None
    from pupiloptixlab_tpu.flatten.refit import refit_scene

    data1 = refit_scene(data0, w._refit, w.scene)
    _tree_allclose(data0, data1)


def test_transform_refit_matches_host_reflatten(cornell_world):
    w = cornell_world
    data0, config0 = w.get_scene_data()
    ro = w.get_render_object("ShortBox")
    ro.apply_transform(Transform().translate(0.15, 0.05, -0.1))
    data1, config1 = w.get_scene_data()  # device refit path
    assert config1 == config0
    host, _ = flatten_scene(w.scene)  # independent full host flatten
    # cornell (36 tris) has no BVH reorder -> rows comparable directly
    _tree_allclose(data1.tris, host.tris)
    _tree_allclose(data1.emitters, host.emitters)
    _tree_allclose(data1.spheres, host.spheres)


def test_emitter_transform_refit(cornell_world):
    """Moving the LIGHT must rebuild emitter rows, areas and the CDF."""
    w = cornell_world
    w.get_scene_data()
    ro = w.get_render_object("Light")
    ro.apply_transform(Transform().translate(0.1, -0.05, 0.0))
    data1, _ = w.get_scene_data()
    host, _ = flatten_scene(w.scene)
    _tree_allclose(data1.emitters, host.emitters)


def test_visibility_refit_matches_host(cornell_world):
    w = cornell_world
    w.get_scene_data()
    ro = w.get_render_object("TallBox")
    ro.set_visible(False)
    data1, config1 = w.get_scene_data()
    # refit degenerates edges instead of collapsing to the centroid, so
    # compare at the render level against the host flatten
    host, hconfig = flatten_scene(w.scene)
    cam = camera_block(w.camera)
    img_refit = np.asarray(render(data1, cam, config1, spp=4))
    img_host = np.asarray(render(host, cam, hconfig, spp=4))
    np.testing.assert_allclose(img_refit, img_host, atol=1e-5, rtol=1e-4)
    ro.set_visible(True)
    data2, _ = w.get_scene_data()
    host2, _ = flatten_scene(w.scene)
    _tree_allclose(data2.tris, host2.tris)


def test_refit_render_matches_host_render_with_bvh(tmp_path):
    """Mesh scene (BVH path): refit must render the moved scene right.
    The BVH keeps its topology (refit semantics) so arrays are NOT
    comparable to a host rebuild — images are."""
    w = World()
    scene = load_scene("/root/repo/data/mesh_env.xml")
    scene.sensor.film.w, scene.sensor.film.h = 32, 32
    w.set_scene(scene)
    data0, config0 = w.get_scene_data()
    assert config0.bvh_nodes > 0
    ro = w.render_objects[0]
    ro.apply_transform(Transform().translate(0.3, 0.1, 0.0))
    data1, config1 = w.get_scene_data()
    assert config1 == config0
    host, hconfig = flatten_scene(w.scene)
    cam = camera_block(w.camera)
    img_refit = np.asarray(render(data1, cam, config1, spp=2))
    img_host = np.asarray(render(host, cam, hconfig, spp=2))
    assert np.isfinite(img_refit).all()
    np.testing.assert_allclose(img_refit, img_host, atol=1e-4, rtol=1e-3)


def test_refit_no_retrace(cornell_world):
    """Consecutive edits reuse ONE cached refit executable and ONE frame
    executable (the whole point of the instance layer)."""
    import jax.numpy as jnp
    from pupiloptixlab_tpu.flatten.refit import _refit_device
    from pupiloptixlab_tpu.render.integrator import render_frame

    w = cornell_world
    data, config = w.get_scene_data()
    n = config.width * config.height
    cam = camera_block(w.camera)
    accum = jnp.zeros((n, 3), jnp.float32)
    render_frame(data, cam, jnp.uint32(0), jnp.int32(0), accum, config)

    misses0 = _refit_device._cache_size()
    ro = w.get_render_object("ShortBox")
    for i in range(3):
        ro.apply_transform(Transform().translate(0.01 * i, 0.0, 0.0))
        data, config = w.get_scene_data()
        accum = jnp.zeros((n, 3), jnp.float32)
        render_frame(data, cam, jnp.uint32(i), jnp.int32(0), accum, config)
    assert _refit_device._cache_size() - misses0 <= 1
