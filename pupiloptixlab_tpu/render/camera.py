"""Device camera ray generation.

Parity: the raygen prologue (example/path_tracer/main.cu:55-75): jittered
subpixel -> sample_to_camera (perspective divide by w, normalize) ->
camera_to_world rotation; origin from the translation column.
"""

from __future__ import annotations

import jax.numpy as jnp

from pupiloptixlab_tpu.flatten.types import CameraBlock
from pupiloptixlab_tpu.render.sampling import normalize


def generate_rays(
    camera: CameraBlock,
    width: int,
    height: int,
    jitter_x: jnp.ndarray,
    jitter_y: jnp.ndarray,
):
    """Primary rays for the full film. jitter_* are (N,) in [0,1),
    N = width*height, pixel order row-major (y*width + x)."""
    n = width * height
    idx = jnp.arange(n, dtype=jnp.int32)
    px = (idx % width).astype(jnp.float32)
    py = (idx // width).astype(jnp.float32)
    sx = (px + jitter_x) / width
    sy = (py + jitter_y) / height

    s2c = camera.sample_to_camera
    c2w = camera.camera_to_world
    film = jnp.stack([sx, sy, jnp.zeros_like(sx), jnp.ones_like(sx)], axis=-1)
    d = film @ s2c.T  # (N,4)
    d = d[:, :3] / d[:, 3:4]
    d = normalize(d)
    world_d = normalize(d @ c2w[:3, :3].T)
    origin = jnp.broadcast_to(c2w[:3, 3], (n, 3))
    return origin, world_d
