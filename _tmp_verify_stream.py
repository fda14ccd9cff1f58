"""Real-TPU gate for the streamed nested-drain diff: render mesh_env
with the STREAMED kernels (cutoff patched to 1 byte) and with the
resident kernels on the SAME flattened tables; frames must match."""
import json

import jax
import jax.numpy as jnp

import pupiloptixlab_tpu.accel.pallas_bvh as pb

pb.STREAM_TRI_BYTES = 1  # force streaming in flatten + sweep selection

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render.integrator import render_frame
from pupiloptixlab_tpu.scene import load_scene

scene = load_scene("data/mesh_env.xml")
scene.sensor.film.w, scene.sensor.film.h = 512, 288
data, config = flatten_scene(scene)
camera = camera_block_from_scene(scene)
n = config.width * config.height


def render():
    accum = jnp.zeros((n, 3), jnp.float32)
    accum, bufs = render_frame(
        data, camera, jnp.uint32(3), jnp.int32(0), accum, config
    )
    return jax.device_get(bufs["frame"])


streamed = render()
pb.STREAM_TRI_BYTES = 1 << 60  # same tables, resident sweep
resident = render()
diff = float(abs(streamed - resident).max())
print(json.dumps({"max_abs_diff": diff, "ok": diff == 0.0}))
