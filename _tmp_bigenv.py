import time, json, jax, jax.numpy as jnp
from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render.integrator import render_frame
from pupiloptixlab_tpu.scene import load_scene
scene = load_scene('/tmp/pupil_big_env/big_env.xml')
scene.sensor.film.w, scene.sensor.film.h = 1920, 1080
data, config = flatten_scene(scene)
camera = camera_block_from_scene(scene)
n = config.width * config.height
accum = jnp.zeros((n, 3), jnp.float32)
accum, bufs = render_frame(data, camera, jnp.uint32(0), jnp.int32(0), accum, config)
jax.block_until_ready(bufs['frame'])
t0 = time.perf_counter()
for i in range(3):
    accum, bufs = render_frame(data, camera, jnp.uint32(i+1), jnp.int32(i+1), accum, config)
jax.block_until_ready(bufs['frame'])
dt = (time.perf_counter()-t0)/3
print(json.dumps({'big_env_ms': round(dt*1e3,1), 'mean': round(float(jnp.mean(accum)),5)}))
