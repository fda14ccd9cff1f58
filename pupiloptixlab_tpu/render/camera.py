"""Device camera ray generation (plane layout).

Parity: the raygen prologue (example/path_tracer/main.cu:55-75): jittered
subpixel -> sample_to_camera (perspective divide by w, normalize) ->
camera_to_world rotation; origin from the translation column.
"""

from __future__ import annotations

import jax.numpy as jnp

from pupiloptixlab_tpu.flatten.types import CameraBlock
from pupiloptixlab_tpu.render.vec import Vec3


def generate_rays(
    camera: CameraBlock,
    width: int,
    height: int,
    jitter_x: jnp.ndarray,
    jitter_y: jnp.ndarray,
):
    """Primary rays for the full film. jitter_* are (N,) in [0,1),
    N = width*height, pixel order row-major (y*width + x).
    Returns (origin Vec3, direction Vec3)."""
    idx = jnp.arange(width * height, dtype=jnp.int32)
    return generate_rays_for(camera, width, height, idx, jitter_x, jitter_y)


def generate_rays_for(
    camera: CameraBlock,
    width: int,
    height: int,
    pixel_ids: jnp.ndarray,
    jitter_x: jnp.ndarray,
    jitter_y: jnp.ndarray,
):
    """Primary rays for arbitrary per-lane pixel ids (wavefront refill)."""
    n = pixel_ids.shape[0]
    idx = pixel_ids
    px = (idx % width).astype(jnp.float32)
    py = (idx // width).astype(jnp.float32)
    sx = (px + jitter_x) / width
    sy = (py + jitter_y) / height

    s = camera.sample_to_camera
    c = camera.camera_to_world
    # d = S2C @ (sx, sy, 0, 1); perspective divide; normalize
    dx = s[0, 0] * sx + s[0, 1] * sy + s[0, 3]
    dy = s[1, 0] * sx + s[1, 1] * sy + s[1, 3]
    dz = s[2, 0] * sx + s[2, 1] * sy + s[2, 3]
    dw = s[3, 0] * sx + s[3, 1] * sy + s[3, 3]
    d = Vec3(dx / dw, dy / dw, dz / dw).normalized()
    world_d = Vec3(
        c[0, 0] * d.x + c[0, 1] * d.y + c[0, 2] * d.z,
        c[1, 0] * d.x + c[1, 1] * d.y + c[1, 2] * d.z,
        c[2, 0] * d.x + c[2, 1] * d.y + c[2, 2] * d.z,
    ).normalized()
    origin = Vec3(
        jnp.broadcast_to(c[0, 3], (n,)),
        jnp.broadcast_to(c[1, 3], (n,)),
        jnp.broadcast_to(c[2, 3], (n,)),
    )
    return origin, world_d
