import numpy as np
import pytest

from pupiloptixlab_tpu.utils.math import (
    AABB,
    Transform,
    look_at_matrix,
    mitsuba_handedness_fix,
    rotate_matrix,
    transform_normals,
    transform_point,
    transform_points,
)


def test_translate_then_scale_order():
    # ops compose op @ M: the most recent op applies last to points.
    t = Transform().translate(1, 0, 0).scale(2, 2, 2)
    p = transform_point([0, 0, 0], t.matrix)
    np.testing.assert_allclose(p, [2, 0, 0], atol=1e-6)
    t2 = Transform().scale(2, 2, 2).translate(1, 0, 0)
    p2 = transform_point([0, 0, 0], t2.matrix)
    np.testing.assert_allclose(p2, [1, 0, 0], atol=1e-6)


def test_rotate_matrix_90_about_x():
    r = rotate_matrix(1, 0, 0, 90.0)
    p = transform_point([0, 1, 0], r)
    np.testing.assert_allclose(p, [0, 0, 1], atol=1e-6)


def test_rotate_matrix_matches_reference_quaternion_form():
    # axis not normalized on input; arbitrary axis/angle vs scipy rotation
    from scipy.spatial.transform import Rotation

    axis = np.array([1.0, 2.0, 3.0])
    angle = 37.0
    r = rotate_matrix(*axis, angle)[:3, :3]
    expected = Rotation.from_rotvec(
        np.radians(angle) * axis / np.linalg.norm(axis)
    ).as_matrix()
    np.testing.assert_allclose(r, expected, atol=1e-5)


def test_look_at_camera_axes():
    m = look_at_matrix([0, 0, 5], [0, 0, 0], [0, 1, 0])
    # camera +Z points from target toward origin (away from view, RH)
    np.testing.assert_allclose(m[:3, 2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(m[:3, 3], [0, 0, 5], atol=1e-6)
    # after the mitsuba fix, -Z column is the view direction
    fixed = mitsuba_handedness_fix(m)
    np.testing.assert_allclose(fixed[:3, 2], [0, 0, -1], atol=1e-6)


def test_transform_normals_nonuniform_scale():
    m = Transform().scale(2, 1, 1).matrix
    n = transform_normals(np.array([[1.0, 1.0, 0.0]]) / np.sqrt(2), m)[0]
    # normals transform by inverse-transpose: x component shrinks
    assert n[0] < n[1]
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-6)


def test_aabb_transform_8_corners():
    box = AABB().merge_point([-1, -1, -1]).merge_point([1, 1, 1])
    r = rotate_matrix(0, 0, 1, 45.0)
    out = box.transform(r)
    s = np.sqrt(2.0)
    np.testing.assert_allclose(out.max, [s, s, 1], atol=1e-5)


def test_transform_points_batch_matches_single():
    m = Transform().rotate(0, 1, 0, 30).translate(1, 2, 3).matrix
    pts = np.random.RandomState(0).randn(16, 3).astype(np.float32)
    batch = transform_points(pts, m)
    for i in range(len(pts)):
        np.testing.assert_allclose(batch[i], transform_point(pts[i], m), atol=1e-5)
