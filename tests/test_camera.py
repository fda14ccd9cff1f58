import math

import numpy as np

from pupiloptixlab_tpu.utils.camera import Camera, CameraDesc, sample_to_camera_matrix
from pupiloptixlab_tpu.utils.math import (
    Transform,
    look_at_matrix,
    mitsuba_handedness_fix,
)


def _ray_dir(s2c, c2w, sx, sy):
    """Reproduce the raygen math (example/path_tracer/main.cu:55-75)."""
    p = np.array([sx, sy, 0.0, 1.0], np.float32)
    d = s2c @ p
    d = d / d[3]
    d3 = d[:3] / np.linalg.norm(d[:3])
    w = c2w[:3, :3] @ d3
    return w / np.linalg.norm(w)


def test_sample_to_camera_center_points_forward():
    s2c = sample_to_camera_matrix(60.0, 1.0, 0.01, 10000.0)
    p = s2c @ np.array([0.5, 0.5, 0.0, 1.0], np.float32)
    d = p[:3] / p[3]
    d = d / np.linalg.norm(d)
    # RH camera: forward is -Z
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-5)


def test_fov_edge_rays():
    fov = 60.0
    s2c = sample_to_camera_matrix(fov, 1.0, 0.01, 100.0)
    # film x=1 edge: the half-angle off axis equals fov/2 (square film)
    p = s2c @ np.array([1.0, 0.5, 0.0, 1.0], np.float32)
    d = p[:3] / p[3]
    d = d / np.linalg.norm(d)
    angle = math.degrees(math.atan2(abs(d[0]), abs(d[2])))
    assert abs(angle - fov / 2) < 1e-3


def test_lookat_camera_rays_hit_target():
    # double handedness fix cancels for look-at sensors
    to_world = mitsuba_handedness_fix(
        mitsuba_handedness_fix(look_at_matrix([2, 2, 2], [0, 0, 0], [0, 1, 0]))
    )
    cam = Camera(CameraDesc(fov_y=45, aspect_ratio=1.0, to_world=Transform(to_world)))
    d = _ray_dir(cam.sample_to_camera, cam.to_world, 0.5, 0.5)
    expected = -np.array([2, 2, 2]) / np.linalg.norm([2, 2, 2])
    np.testing.assert_allclose(d, expected, atol=1e-5)
    np.testing.assert_allclose(cam.position, [2, 2, 2], atol=1e-6)


def test_matrix_sensor_cornell():
    # cornellbox.xml sensor matrix, after the single sensor fix
    m = np.array(
        [[-1, 0, 0, 0], [0, 1, 0, 1], [0, 0, -1, 6.8], [0, 0, 0, 1]], np.float32
    )
    fixed = mitsuba_handedness_fix(m)
    cam = Camera(CameraDesc(fov_y=19.5, aspect_ratio=1.0, to_world=Transform(fixed)))
    d = _ray_dir(cam.sample_to_camera, cam.to_world, 0.5, 0.5)
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(cam.position, [0, 1, 6.8], atol=1e-6)


def test_screen_y_up():
    # film y=1 should point above the view axis (NDC y up): rays toward +y
    m = np.eye(4, dtype=np.float32)
    cam = Camera(CameraDesc(fov_y=90, aspect_ratio=1.0, to_world=Transform(m)))
    d = _ray_dir(cam.sample_to_camera, cam.to_world, 0.5, 1.0)
    assert d[1] > 0.1


def test_camera_move_rotate():
    cam = Camera(CameraDesc(fov_y=60, aspect_ratio=1.0, to_world=Transform()))
    cam.move(np.array([0, 0, -1], np.float32))  # forward = -z in camera frame
    np.testing.assert_allclose(cam.position, [0, 0, -1], atol=1e-6)
    cam.rotate(90.0, 0.0)  # yaw
    right, up, forward = cam.coordinate_system()
    np.testing.assert_allclose(up, [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(right), 1.0, atol=1e-5)


def test_fov_clamp():
    cam = Camera(CameraDesc(fov_y=60, aspect_ratio=1.0))
    cam.set_fov(500.0)
    assert cam.fov_y == 180.0
    cam.set_fov(0.0001)
    assert cam.fov_y == 0.012
