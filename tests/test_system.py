"""System/World/Pass/Buffer/Display integration tests (CPU)."""

import numpy as np
import pytest

from pupiloptixlab_tpu.passes import PTPass
from pupiloptixlab_tpu.system import System
from pupiloptixlab_tpu.system.buffers import BufferFlag
from pupiloptixlab_tpu.utils.event import CAMERA_CHANGE
from pupiloptixlab_tpu.utils.math import Transform


@pytest.fixture(scope="module")
def small_system(reference_scene_dir):
    system = System(has_display=True)
    system.add_pass(PTPass(max_depth=2))
    scene_path = reference_scene_dir / "cornellbox.xml"
    # shrink film via World after load for speed
    assert system.set_scene(scene_path)
    system.world.scene.sensor.film.w = 16
    system.world.scene.sensor.film.h = 16
    system.world._scene_dirty = True
    system.events.dispatch(
        "system/scene_load", system.world
    )  # re-init pass at new film size
    return system


def test_render_loop_and_buffers(small_system):
    s = small_system
    s.run(max_frames=3)
    pt = s.passes[0]
    assert pt.sample_cnt == 3
    names = s.buffers.displayable_names()
    for expected in ("pt frame", "pt accum", "pt albedo", "pt normal", "pt test"):
        assert expected in names
    frame = np.asarray(s.buffers["pt frame"].array)
    assert np.isfinite(frame).all()
    assert frame.max() > 0


def test_camera_change_resets_accumulation(small_system):
    s = small_system
    s.run(max_frames=2)
    pt = s.passes[0]
    assert pt.sample_cnt >= 2
    s.events.dispatch(CAMERA_CHANGE)
    s.run(max_frames=1)
    assert pt.sample_cnt == 1  # dirty -> restarted


def test_display_client_flip_and_screenshot(small_system, tmp_path):
    s = small_system
    s.run(max_frames=1)
    img = s.display.latest_image()
    assert img is not None and img.shape == (16, 16, 3)
    # display path quantizes on-device (client.py:83-86): uint8 [0, 255]
    assert img.dtype == np.uint8
    assert img.max() > 0
    out = tmp_path / "shot.exr"
    s.display.save_screenshot(out)
    assert out.exists()
    from pupiloptixlab_tpu.utils.image import read_exr

    assert read_exr(out).shape == (16, 16, 4)


def test_interaction_events_move_camera(small_system):
    s = small_system
    pos0 = s.world.camera.position
    s.display.key("w")
    pos1 = s.world.camera.position
    assert not np.allclose(pos0, pos1)
    fov0 = s.world.camera.fov_y
    s.display.mouse_wheel(2.0)
    assert s.world.camera.fov_y != fov0
    s.display.mouse_drag(10.0, 0.0)  # should not raise; rotates camera


def test_instance_transform_edit_marks_dirty(small_system):
    s = small_system
    ro = s.world.get_render_object("ShortBox")
    assert ro is not None
    before = s.passes[0]._dirty
    ro.apply_transform(Transform().translate(0.05, 0, 0))
    assert s.passes[0]._dirty
    # re-flatten reflects the edit
    data, config = s.world.get_scene_data()
    assert config.tri_count == 36


def test_visibility_toggle_keeps_static_shapes(small_system):
    """Hiding an instance must NOT shrink the flattened tables (that
    would change RenderConfig, a static jit arg, and force a retrace).
    Hidden geometry is degenerated in place instead."""
    import numpy as np

    s = small_system
    ro = s.world.get_render_object("TallBox")
    ro.set_visible(False)
    data, config = s.world.get_scene_data()
    assert config.tri_count == 36  # cube rows retained, degenerate
    packed = np.asarray(data.tris.packed)[: config.tri_count]
    edges = np.abs(packed[:, 3:9]).sum(axis=1)
    assert (edges < 1e-6).sum() == 12  # the hidden cube's 12 tris
    ro.set_visible(True)
    data, config = s.world.get_scene_data()
    assert config.tri_count == 36
    packed = np.asarray(data.tris.packed)[: config.tri_count]
    assert (np.abs(packed[:, 3:9]).sum(axis=1) < 1e-6).sum() == 0
